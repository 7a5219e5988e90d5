"""simplerecon_tpu — a TPU-native multi-view-stereo depth + 3D reconstruction
framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of nianticlabs/simplerecon
(ECCV 2022, "SimpleRecon: 3D Reconstruction Without 3D Convolutions") for
TPU hardware:

  * metadata-injected plane-sweep cost volumes (the "feature volume")
  * 2D encoder/decoder depth networks (no 3D convolutions)
  * DVMVS-style online keyframing and tuple generation
  * TSDF / point-cloud fusion to meshes
  * data-parallel training over a `jax.sharding.Mesh`

Subpackages
-----------
ops       pure-JAX compute kernels: geometry, grid sampling, image filters,
          plane-sweep cost volumes (XLA + Pallas paths)
models    Flax module zoo: matching encoders, EfficientNetV2 image prior,
          cost-volume encoder, UNet++ depth decoder, the full DepthModel
data      host-side data pipeline: datasets, loaders, tuple generation,
          keyframe buffers, .sens decoding
parallel  device-mesh construction and sharded train/eval steps
fusion    TSDF volume + fuser (JAX), point-cloud fusion, marching cubes
          (native C++) and PLY I/O
render    headless mesh rendering (native C++ rasterizer)
native    C++ kernels built on demand (marching cubes, rasterizer)
utils     metrics, visualization, checkpointing, output caching
scripts   CLI entry points: train, test, pc_fusion, tuple generation,
          preprocessing, visualization
"""

__version__ = "0.1.0"
