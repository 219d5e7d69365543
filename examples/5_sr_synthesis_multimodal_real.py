"""Multimodal T1+T2 inputs, real target, registration-error simulation
(reference tutorials/5)."""
import os, time
import numpy as np
from common import (GEN_CLASSES, GEN_LABELS, LABELS, N_SAMPLES,
                    RESULTS, SMOKE_SHAPE, ensure_images, priors)

IMAGES = ensure_images()
from synthsr_tpu.io.volume import save_volume
from synthsr_tpu.synth.brain_generator import BrainGenerator

pm = np.concatenate([np.load(priors("t1_lr")[0]), np.load(priors("t2")[0])], 0)
ps = np.concatenate([np.load(priors("t1_lr")[1]), np.load(priors("t2")[1])], 0)
gen = BrainGenerator(labels_dir=LABELS, images_dir=IMAGES,
                     generation_labels=GEN_LABELS, generation_classes=GEN_CLASSES,
                     prior_means=pm, prior_stds=ps, prior_distributions="normal",
                     input_channels=[True, True], output_channel=None,
                     data_res=np.array([[1.0, 1.0, 3.0], [1.0, 4.5, 1.0]]),
                     thickness=np.array([[1.0, 1.0, 3.0], [1.0, 3.0, 1.0]]),
                     downsample=True, build_reliability_maps=True,
                     simulate_registration_error=True, output_shape=SMOKE_SHAPE)
out = os.path.join(RESULTS, "5-SR_synthesis_multimodal_real"); os.makedirs(out, exist_ok=True)
for n in range(N_SAMPLES):
    t0 = time.time()
    inputs, target = gen.generate_brain()
    print(f"sample {n}: {time.time() - t0:.2f}s shapes {inputs.shape} {target.shape}")
    for c, name in ((0, "t1"), (2, "t2")):
        save_volume(inputs[..., c], gen.aff, None, f"{out}/input_{name}_{n}.nii.gz")
    save_volume(target, gen.aff, None, f"{out}/target_{n}.nii.gz")
