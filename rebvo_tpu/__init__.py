"""rebvo_tpu — a TPU-native edge-based visual-inertial odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of REBVO
(Tarrio & Pedre, ICCV 2015 / JIRS 2017; reference C++ implementation
surveyed in SURVEY.md).  The per-frame VO pipeline is a single jitted,
vmap-able step function over fixed-shape keyline batches; the runtime
around it (datasets, telemetry, logging) lives in `io/` with native
C++ components under `native/`.

Layering (see SURVEY.md §7.1):
  core/      geometry + filtering primitives (camera model, SO3, solvers)
  kernels/   dense per-pixel / per-keyline device kernels
  frontend/  the per-frame VO step function + state pytrees
  backend/   keyframes, pose-graph, bundle adjustment
  io/        dataset readers, trajectory/log writers, telemetry export
  parallel/  device-mesh construction and multi-sequence sharding
  apps/      CLI entry points
"""

__version__ = "0.1.0"

from rebvo_tpu.config import REBVOParameters, load_config
