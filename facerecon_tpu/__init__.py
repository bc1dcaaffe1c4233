"""facerecon_tpu — TPU-native single-image 3D face reconstruction framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of the
Cogito2012/3DFaceRecon reference (see SURVEY.md): a CNN regresses 3D Morphable
Model coefficients from one aligned face photo, a BFM decoder turns the
coefficients into a textured mesh, and a differentiable TPU renderer
(Pallas z-buffer rasterizer + SH-9 illumination) re-renders the mesh so the
network trains self-supervised with photometric + landmark + regularization
losses.

Layer map (SURVEY.md §2, TPU rebuild column):
  K0 kernels   -> facerecon_tpu.ops.rasterize_pallas  (Pallas TPU rasterizer)
  K1 assets    -> facerecon_tpu.utils.bfm             (.npz BFM pack loader)
  K2 geometry  -> facerecon_tpu.ops.geometry / ops.sh (fused jnp under jit)
  K3 model     -> facerecon_tpu.models.resnet         (flax CNN regressor)
  K4 losses    -> facerecon_tpu.ops.losses
  K5 drivers   -> facerecon_tpu.{train,infer,fit,track}
  K6 data      -> facerecon_tpu.data
  K7 export    -> facerecon_tpu.utils.{obj_io,metrics}
  K8 sharding  -> facerecon_tpu.parallel
"""

__version__ = "0.1.0"

from facerecon_tpu.config import FaceReconConfig, default_config  # noqa: F401
