"""Shared paths/config for the example scripts (reference scripts/tutorials).

Point SYNTHSR_DATA at a directory containing labels/ (+ images/ for real-target
examples) and labels_classes_priors/; defaults to the reference assets.

The reference ships the paired real images via git-LFS, which is frequently
absent; ``ensure_images()`` synthesizes GMM stand-in T1 volumes from the label
maps + shipped priors so examples 1/3/5/8 always run.

Set SYNTHSR_SMOKE=1 for a fast CI-style run (1 sample, 64³ crops where the
tutorial would use the full volume).
"""
import os

DATA = os.environ.get("SYNTHSR_DATA", "/root/reference/data")
LABELS = os.path.join(DATA, "labels")
IMAGES = os.path.join(DATA, "images")
PRIORS = os.path.join(DATA, "labels_classes_priors")
RESULTS = os.environ.get("SYNTHSR_RESULTS", "./generated_examples")

GEN_LABELS = os.path.join(PRIORS, "generation_labels.npy")
GEN_CLASSES = os.path.join(PRIORS, "generation_classes.npy")

SMOKE = bool(int(os.environ.get("SYNTHSR_SMOKE", "0")))
N_SAMPLES = 1 if SMOKE else 3
SMOKE_SHAPE = 64 if SMOKE else None  # None = tutorial default (full volume)


def priors(contrast):
    return (os.path.join(PRIORS, f"prior_means_{contrast}.npy"),
            os.path.join(PRIORS, f"prior_stds_{contrast}.npy"))


def ensure_images():
    """Return a directory of HR T1 images paired (by sorted order) with the
    label maps — the reference's ``data/images`` when present, else synthesized
    GMM stand-ins (per-class t1_hr prior means + noise + light smoothing)."""
    import numpy as np

    from synthsr_tpu.utils.misc import list_images_in_folder

    def _listing(d):
        try:
            return list_images_in_folder(d)
        except RuntimeError:  # raises on empty dirs
            return []

    if os.path.isdir(IMAGES) and _listing(IMAGES):
        return IMAGES
    standin = os.path.join(RESULTS, "_standin_images")
    labels = list_images_in_folder(LABELS)
    os.makedirs(standin, exist_ok=True)
    if len(_listing(standin)) == len(labels):
        return standin

    from scipy.ndimage import gaussian_filter

    from synthsr_tpu.io.volume import load_volume, save_volume

    gen_labels = np.load(GEN_LABELS)
    gen_classes = np.load(GEN_CLASSES)
    means = np.load(priors("t1_hr")[0])[0]  # class means row
    lut = np.zeros(int(gen_labels.max()) + 1, np.float32)
    lut[gen_labels] = means[gen_classes]
    rng = np.random.default_rng(0)
    for p in labels:
        lab, aff, h = load_volume(p, im_only=False, dtype="int32")
        lab = np.clip(lab, 0, len(lut) - 1)
        im = lut[lab] + rng.normal(0, 6.0, lab.shape).astype(np.float32)
        im = gaussian_filter(im, 0.6) * (lab > 0)
        name = os.path.basename(p).replace("_labels", "")
        save_volume(im.astype(np.float32), aff, h, os.path.join(standin, name))
    return standin
