"""synthsr_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of SynthSR's capabilities.

Brand-new framework with the feature surface of BBillot/SynthSR: on-the-fly
synthetic training-pair generation from brain label maps, 3D U-Net
super-resolution/synthesis training (with optional segmentation-Dice
regularization and WGAN-GP fine-tuning), and joint T1/T2 + CT inference —
re-designed around XLA compilation, static shapes, jax.sharding meshes, and
Pallas kernels rather than the reference's Keras graph.

Subpackages
-----------
- ``io``       host-side volume I/O + numpy geometry (NIfTI/MGZ readers built in)
- ``ops``      pure-JAX/Pallas compute primitives (warp, blur, resize, GMM, ...)
- ``synth``    the generative model: label map -> (input image, target) on device
- ``models``   flax 3D U-Net + WGAN discriminator + Keras .h5 weight import
- ``train``    jitted/sharded training loops (supervised, adversarial), orbax ckpt
- ``parallel`` device meshes, data-parallel sharding, spatial halo sharding
- ``cli``      predict / train command-line entry points
"""

__version__ = "0.1.0"
