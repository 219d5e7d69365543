"""Shared paths/config for the example scripts (reference scripts/tutorials).

Point SYNTHSR_DATA at a directory containing labels/ (+ images/ for real-target
examples) and labels_classes_priors/; defaults to the reference assets.
"""
import os

DATA = os.environ.get("SYNTHSR_DATA", "/root/reference/data")
LABELS = os.path.join(DATA, "labels")
IMAGES = os.path.join(DATA, "images")
PRIORS = os.path.join(DATA, "labels_classes_priors")
RESULTS = os.environ.get("SYNTHSR_RESULTS", "./generated_examples")

GEN_LABELS = os.path.join(PRIORS, "generation_labels.npy")
GEN_CLASSES = os.path.join(PRIORS, "generation_classes.npy")


def priors(contrast):
    return (os.path.join(PRIORS, f"prior_means_{contrast}.npy"),
            os.path.join(PRIORS, f"prior_stds_{contrast}.npy"))
