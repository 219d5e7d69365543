"""Plain SR with synthetic HR targets (reference tutorials/2-SR_synthetic.py)."""
import os, time
import numpy as np
from common import N_SAMPLES, GEN_CLASSES, GEN_LABELS, LABELS, RESULTS, priors
from synthsr_tpu.io.volume import save_volume
from synthsr_tpu.synth.brain_generator import BrainGenerator

pm, ps = priors("t1_lr")
gen = BrainGenerator(labels_dir=LABELS, generation_labels=GEN_LABELS,
                     generation_classes=GEN_CLASSES, prior_means=pm, prior_stds=ps,
                     prior_distributions="normal", input_channels=True,
                     output_channel=0, target_res=1.5, output_shape=128,
                     data_res=np.array([1.0, 1.0, 3.0]),
                     thickness=np.array([1.0, 1.0, 3.0]),
                     downsample=True, build_reliability_maps=True)
out = os.path.join(RESULTS, "2-SR_synthetic"); os.makedirs(out, exist_ok=True)
for n in range(N_SAMPLES):
    t0 = time.time()
    inputs, target = gen.generate_brain()
    print(f"sample {n}: {time.time() - t0:.2f}s")
    save_volume(inputs[..., 0], gen.aff, None, f"{out}/input_{n}.nii.gz")
    save_volume(target, gen.aff, None, f"{out}/target_{n}.nii.gz")
