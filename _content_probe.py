import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from gsworld_tpu.rollout.random_actions import build
B = 16
env, wrapper = build("AlignFr3Env-v1", num_envs=B, cfg_name="fr3_align",
                     sim_freq=120, control_freq=40, width=640, height=480,
                     max_per_tile=1024, tile_chunk=16,
                     max_tiles_per_gaussian=16, active_budget_frac=1.0)
obs, _ = wrapper.reset(seed=0)
state = env.state
# clone env 0 into all envs
state0 = jax.tree.map(
    lambda x: jnp.broadcast_to(x[:1], x.shape) if hasattr(x, 'shape')
    and x.ndim >= 1 and x.shape[0] == B else x, state)
ren = jax.jit(wrapper._render_fn)
def t(s):
    out = ren(s); jax.block_until_ready(out)
    perturb = jax.jit(lambda ss, i: ss.replace(world=ss.world.replace(
        qpos=ss.world.qpos + i * 1e-6)))
    best = np.inf
    for i in range(3):
        s2 = perturb(s, jnp.float32(i + 1)); jax.block_until_ready(s2.world.qpos)
        t0 = time.perf_counter(); out = ren(s2); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3
print(f"B=16, 16 distinct env states: {t(state):.0f} ms = {t(state)/(2*B):.1f} ms/frame", flush=True)
print(f"B=16, env-0 cloned to all:    {t(state0):.0f} ms = {t(state0)/(2*B):.1f} ms/frame", flush=True)
