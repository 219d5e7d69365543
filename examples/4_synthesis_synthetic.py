"""T2 -> T1 synthesis with synthetic targets (reference tutorials/4)."""
import os, time
import numpy as np
from common import N_SAMPLES, GEN_CLASSES, GEN_LABELS, LABELS, RESULTS, priors
from synthsr_tpu.io.volume import save_volume
from synthsr_tpu.synth.brain_generator import BrainGenerator

pm_t2, ps_t2 = priors("t2")
pm_t1, ps_t1 = priors("t1_hr")
pm = np.concatenate([np.load(pm_t1), np.load(pm_t2)], 0)
ps = np.concatenate([np.load(ps_t1), np.load(ps_t2)], 0)
gen = BrainGenerator(labels_dir=LABELS, generation_labels=GEN_LABELS,
                     generation_classes=GEN_CLASSES, prior_means=pm, prior_stds=ps,
                     prior_distributions="normal",
                     input_channels=[False, True], output_channel=0,
                     output_shape=128, randomise_res=True,
                     build_reliability_maps=True)
out = os.path.join(RESULTS, "4-synthesis_synthetic"); os.makedirs(out, exist_ok=True)
for n in range(N_SAMPLES):
    t0 = time.time()
    inputs, target = gen.generate_brain()
    print(f"sample {n}: {time.time() - t0:.2f}s")
    save_volume(inputs[..., 0], gen.aff, None, f"{out}/input_t2_{n}.nii.gz")
    save_volume(target, gen.aff, None, f"{out}/target_t1_{n}.nii.gz")
