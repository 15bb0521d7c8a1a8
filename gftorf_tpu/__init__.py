"""gftorf_tpu: TPU-native differentiable Gaussian splatting with time-of-flight rendering.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
GF-ToRF system ("Time of the Flight of the Gaussians"): a single-pass
differentiable rasterizer that renders RGB images and continuous-wave
time-of-flight (C-ToF) phasor images, with indirect depth optimization
through ToF phase, per-frame deformation MLPs for dynamic scenes, and
optical-flow supervision.

Design notes (TPU-first, not a port):
 - The rasterizer's per-pixel sequential alpha compositing is reformulated
   as exclusive-cumprod + cumulative-sum prefix operations along the
   depth-sorted axis, which vectorizes onto the TPU VPU and makes the
   backward pass an exact, deterministic autodiff transpose (the reference
   CUDA code hand-writes this chain rule with atomicAdd scatter;
   cf. /root/reference/.../cuda_rasterizer/{forward,backward}.cu).
 - Tile binning uses jax.lax.sort over (tile, depth) keys and a dense
   (num_tiles, max_per_tile) instance layout so all compositing work is
   static-shape and regular.
 - Scatter-reductions (per-Gaussian gradients, pixel counters) use
   segment_sum over the sorted instance list: bitwise reproducible.
 - Dynamic point counts (densify/prune) use fixed-capacity arrays with an
   alive mask; Adam moments live in plain pytrees mirroring the params so
   the reference's "optimizer surgery" becomes masked array updates.
"""

__version__ = "0.1.0"
