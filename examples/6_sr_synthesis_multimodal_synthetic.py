"""Multimodal inputs with a synthetic target channel (reference tutorials/6)."""
import os, time
import numpy as np
from common import N_SAMPLES, GEN_CLASSES, GEN_LABELS, LABELS, RESULTS, priors
from synthsr_tpu.io.volume import save_volume
from synthsr_tpu.synth.brain_generator import BrainGenerator

pm = np.concatenate([np.load(priors("t1_hr")[0]), np.load(priors("t1_lr")[0]),
                     np.load(priors("t2")[0])], 0)
ps = np.concatenate([np.load(priors("t1_hr")[1]), np.load(priors("t1_lr")[1]),
                     np.load(priors("t2")[1])], 0)
gen = BrainGenerator(labels_dir=LABELS, generation_labels=GEN_LABELS,
                     generation_classes=GEN_CLASSES, prior_means=pm, prior_stds=ps,
                     prior_distributions="normal",
                     input_channels=[False, True, True], output_channel=0,
                     output_shape=128,
                     data_res=np.array([[1.0, 1.0, 3.0], [1.0, 4.5, 1.0]]),
                     thickness=np.array([[1.0, 1.0, 3.0], [1.0, 3.0, 1.0]]),
                     downsample=True, build_reliability_maps=True)
out = os.path.join(RESULTS, "6-SR_synthesis_multimodal_synthetic"); os.makedirs(out, exist_ok=True)
for n in range(N_SAMPLES):
    t0 = time.time()
    inputs, target = gen.generate_brain()
    print(f"sample {n}: {time.time() - t0:.2f}s shapes {inputs.shape} {target.shape}")
    save_volume(target, gen.aff, None, f"{out}/target_{n}.nii.gz")
