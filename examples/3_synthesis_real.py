"""Contrast synthesis with real targets and RANDOM acquisition resolution
(reference tutorials/3-synthesis_real.py)."""
import os, time
from common import (GEN_CLASSES, GEN_LABELS, LABELS, N_SAMPLES,
                    RESULTS, SMOKE_SHAPE, ensure_images, priors)

IMAGES = ensure_images()
from synthsr_tpu.io.volume import save_volume
from synthsr_tpu.synth.brain_generator import BrainGenerator

pm, ps = priors("t2")
gen = BrainGenerator(labels_dir=LABELS, images_dir=IMAGES,
                     generation_labels=GEN_LABELS, generation_classes=GEN_CLASSES,
                     prior_means=pm, prior_stds=ps, prior_distributions="normal",
                     input_channels=True, output_channel=None,
                     randomise_res=True, build_reliability_maps=True, output_shape=SMOKE_SHAPE)
out = os.path.join(RESULTS, "3-synthesis_real"); os.makedirs(out, exist_ok=True)
for n in range(N_SAMPLES):
    t0 = time.time()
    inputs, target = gen.generate_brain()
    print(f"sample {n}: {time.time() - t0:.2f}s")
    save_volume(inputs[..., 0], gen.aff, None, f"{out}/input_{n}.nii.gz")
    save_volume(target, gen.aff, None, f"{out}/target_{n}.nii.gz")
