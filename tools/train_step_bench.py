"""Train-step timing at 640x480 / 138k capacity: XLA vs Pallas backward."""
import dataclasses, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gsworld_tpu.gs import synthetic
from gsworld_tpu.gs.model import GaussianScene
from gsworld_tpu.render.camera import RasterConfig, make_camera
from gsworld_tpu.train3dgs.train import TrainState, make_train_step
from gsworld_tpu.train3dgs.densify import DensifyState, init_densify_state
from gsworld_tpu.train3dgs.optim import OptimizationParams, make_optimizer

N = 138_000
rng = np.random.default_rng(0)
splats = synthetic.make_blob(rng, N, [0, 0, 1.0], 1.2, [0.6, 0.4, 0.3], 0,
                             log_scale_mean=-5.5)
scene = GaussianScene(
    means=jnp.asarray(splats["means"]),
    sh0=jnp.asarray(splats["sh0"].reshape(N, 3)),
    shN=jnp.asarray(splats["shN"].reshape(N, 45)),
    log_scales=jnp.asarray(splats["scales"]),
    quats=jnp.asarray(splats["quats"]),
    logit_opacities=jnp.asarray(splats["opacities"].reshape(-1)),
    semantics=jnp.zeros((N,), jnp.int32),
    slot_ids=jnp.zeros((N,), jnp.int32))

w2c = np.eye(4, dtype=np.float32); w2c[2, 3] = 3.0
cam = make_camera(w2c, 0.7, 0.55)
params = OptimizationParams()

for backend in ("pallas", "xla"):
    cfg = RasterConfig(width=640, height=480, max_per_tile=1024,
                       tile_chunk=16, backend=backend)
    tx = make_optimizer(params, 3.0)
    ds = init_densify_state(N, N)
    st = TrainState(scene=scene, ds=ds, opt_state=tx.init(scene),
                    step=jnp.zeros((), jnp.int32))
    step = make_train_step(cfg, params, tx)
    target = jnp.clip(jnp.asarray(
        rng.random((480, 640, 3), np.float32)), 0, 1)
    st2, loss, img = step(st, cam, target)
    jax.block_until_ready(st2)
    ts = []
    stt = st
    for i in range(8):
        tgt = target + (i * 1e-4)
        t0 = time.perf_counter()
        stt, loss, img = step(stt, cam, tgt)
        _ = float(jnp.sum(stt.scene.means)) + float(loss)
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts) * 1e3
    print(f"{backend:7s} train step: p50 {np.percentile(ts, 50):7.1f} ms  "
          f"min {ts.min():7.1f} ms  loss={float(loss):.4f}")
