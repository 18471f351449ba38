"""lbm_tpu — a TPU-native structured-grid stencil & lattice-Boltzmann framework.

A from-scratch JAX/Pallas/shard_map rebuild of the capabilities of the
Graphcore IPU study `thorbenlouw/lbm-graphcore`:

* D2Q9 BGK lattice-Boltzmann solver (lid-driven cavity with obstacle masks
  and an accelerated row), bit-compatible `.params`/`.dat` I/O and golden-file
  verification (reference: main/LastChance.cpp, main/LbmAoS.cpp).
* Gaussian-blur 3x3 image stencil suite with dtype sweep (reference:
  main/GaussianBlur*.cpp).
* Grid partitioning / domain-decomposition planning, introspection and
  visualisation (reference: main/include/StructuredGridUtils.hpp).
* Halo-exchange strategy benchmarks over a TPU mesh (reference:
  main/HaloRegionApproaches.cpp).

Layering (TPU-native collapse of the reference's 5 IPU layers):
  core/      host data model & exact-format I/O            (ref L0)
  ops/       compute kernels: pure-JAX + Pallas fused      (ref L1)
  parallel/  mesh partitioning + shard_map halo exchange   (ref L2/L3)
  models/    end-to-end simulations (D2Q9, D3Q19, blur)    (ref L4)
  utils/     images, profiling, timing                     (ref L0/L3)
  cli/       command-line drivers                          (ref L4)
"""

__version__ = "0.1.0"
