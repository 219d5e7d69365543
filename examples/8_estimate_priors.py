"""Estimate GMM hyperpriors from (image, segmentation) data (reference tutorials/8)."""
from common import GEN_CLASSES, GEN_LABELS, LABELS, RESULTS, ensure_images

IMAGES = ensure_images()
from synthsr_tpu.synth.estimate_priors import build_intensity_stats

build_intensity_stats(list_image_dir=IMAGES, list_labels_dir=LABELS,
                      result_dir=f"{RESULTS}/8-priors",
                      estimation_labels=GEN_LABELS,
                      estimation_classes=GEN_CLASSES)
