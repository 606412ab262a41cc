"""myslam_tpu — TPU-native semantic visual SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
reference ORB-SLAM2 + darknet/YOLOv2 fork (WChen09/My-SLAM): ORB feature
extraction, descriptor matching, bag-of-words place recognition, EPnP/Sim3
RANSAC solvers, Gauss-Newton/LM bundle adjustment with Schur complement,
keyframe-based mapping, loop closing, and a YOLOv2 detector — all as
fixed-shape batched array programs instead of pointer graphs + threads.

Layout (mirrors SURVEY.md §7):
  geom/      SE3/Sim3 Lie groups, projection, triangulation, epipolar geometry
  ops/       low-level compute kernels (pyramid, FAST, ORB, Hamming, top-k)
  features/  ORB extractor pipeline + FrameFeatures SoA container
  matching/  projection/BoW matchers, rotation-consistency, vocabulary
  solvers/   batched RANSAC engines: H/F init, EPnP, Horn Sim3
  optim/     LM core, pose optimization, Schur BA, Sim3 pose graph
  mapping/   fixed-capacity array map store, covisibility, keyframe database
  slam/      tracking state machine, local mapping, loop closing, System facade
  models/    YOLOv2 detector (Flax) + darknet weight import
  parallel/  device mesh, sharded BA and sharded place recognition
  io/        dataset loaders (TUM/KITTI/EuRoC), trajectory writers, ATE eval
"""

__version__ = "0.1.0"

# Matmul precision: the TPU MXU's DEFAULT precision truncates f32
# operands to bf16 (measured |err| ~0.16 on a unit-scale 256-dot).
# "high" (3-pass bf16 decomposition, ~2^-21 relative) is the package
# default: measured on the tracking pipeline it recovers the same
# inlier counts as 6-pass "highest" (~1130 vs bf16's ~870) at ~15%
# more chunk time than bf16 (tools/kf_rate.py A/Bs, round 4).
# Deliberately low-precision paths (YOLO convs) pass explicit bf16
# inputs and are unaffected by this default.
import os as _os

import jax as _jax

if not _os.environ.get("JAX_DEFAULT_MATMUL_PRECISION"):
    _jax.config.update("jax_default_matmul_precision", "high")
# (kf_rate.py A/Bs; set JAX_DEFAULT_MATMUL_PRECISION to experiment)

# Persistent compilation cache: the rare-event programs (loop closing's
# pose graph, group fuse, GBA, vocabulary retrains) each cost a 20-60 s
# compile on the tunnel-attached TPU; with the cache they compile once
# per machine, not once per process. Opt out with
# MYSLAM_NO_COMPILE_CACHE=1 (e.g. to measure cold-start).
# NOT on the CPU backend: serializing multi-device (shard_map) CPU
# executables aborts the process inside
# jax.compilation_cache.put_executable_and_time (observed killing the
# test suite at test_multi_session), and CPU compiles are cheap anyway.
_platforms = str(_jax.config.jax_platforms
                 or _os.environ.get("JAX_PLATFORMS", ""))
if (not _os.environ.get("MYSLAM_NO_COMPILE_CACHE")
        and "cpu" not in _platforms
        and _jax.config.jax_compilation_cache_dir is None):
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
