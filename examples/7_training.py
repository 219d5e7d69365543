"""Joint SR+synthesis training, tutorial-7 config (reference tutorials/7)."""
import numpy as np
from common import GEN_CLASSES, GEN_LABELS, LABELS, RESULTS, priors
from synthsr_tpu.train.training import training

pm = np.concatenate([np.load(priors("t1_hr")[0]), np.load(priors("t1_lr")[0]),
                     np.load(priors("t2")[0])], 0)
ps = np.concatenate([np.load(priors("t1_hr")[1]), np.load(priors("t1_lr")[1]),
                     np.load(priors("t2")[1])], 0)
training(labels_dir=LABELS, model_dir=f"{RESULTS}/7-training",
         prior_means=pm, prior_stds=ps, path_generation_labels=GEN_LABELS,
         path_generation_classes=GEN_CLASSES, prior_distributions="normal",
         input_channels=[False, True, True], output_channel=0,
         work_with_residual_channel=1, output_shape=128,
         data_res=np.array([[1.0, 1.0, 3.0], [1.0, 4.5, 1.0]]),
         thickness=np.array([[1.0, 1.0, 3.0], [1.0, 3.0, 1.0]]),
         downsample=True, build_reliability_maps=True, flipping=True,
         scaling_bounds=0.1, rotation_bounds=8, shearing_bounds=0.01,
         translation_bounds=False, nonlin_std=2.0, bias_field_std=0.2,
         loss_cropping=96, epochs=3, steps_per_epoch=5, lr=1e-4)
