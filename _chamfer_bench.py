import os, time
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from lidarcrafter_tpu.ops.chamfer import chamfer_distance
from lidarcrafter_tpu.ops.pallas_chamfer import chamfer_distance_pallas

N = 26624  # 26 * 1024, eval-scale cloud
x = jax.random.normal(jax.random.PRNGKey(0), (1, N, 3)) * 20
y = jax.random.normal(jax.random.PRNGKey(1), (1, N, 3)) * 20
xm = jnp.ones((1, N), bool); ym = jnp.ones((1, N), bool)

def timeit(f, n=3):
    o = f(); jax.tree_util.tree_map(lambda a: float(jnp.sum(a[..., :1])), o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f()
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a[..., :1])), o)
    return (time.perf_counter() - t0) / n

t_lax = timeit(lambda: chamfer_distance(x, y, xm, ym)[:2])
print(f"lax chunked: {t_lax*1e3:.1f} ms")
t_pl = timeit(lambda: chamfer_distance_pallas(x, y, xm, ym))
print(f"pallas:      {t_pl*1e3:.1f} ms   speedup {t_lax/t_pl:.2f}x")
# numerics
d1l, d2l, _, _ = chamfer_distance(x, y, xm, ym)
d1p, d2p = chamfer_distance_pallas(x, y, xm, ym)
import numpy as np
print("max|d1 diff|", float(jnp.max(jnp.abs(d1l - d1p))),
      "max|d2 diff|", float(jnp.max(jnp.abs(d2l - d2p))))
