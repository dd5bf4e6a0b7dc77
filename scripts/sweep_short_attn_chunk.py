import functools, json, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from laryngeal_tpu.ops import short_attention as SA

orig_pick = SA._pick_chunk


def chain(fn, args, iters=30):
    @jax.jit
    def run(*a):
        def body(i, carry):
            acc, cur = carry
            out = fn(cur, *a[1:])
            bump = jnp.sum(out.astype(jnp.float32)) * 1e-12
            return acc + bump, a[0] + bump.astype(a[0].dtype)
        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), a[0]))
        return acc
    np.asarray(run(*args))
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return 1e3 * (time.perf_counter() - t0) / iters


shapes = {"temporal": (1576, 32, 12, 64), "spatial": (256, 197, 12, 64)}
for name, shape in shapes.items():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.bfloat16) for kk in ks)
    g = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
    for c_fix in (2, 4, 6, 8, 12, 16, 24):
        SA._pick_chunk = lambda *a, _c=c_fix: _c
        fn = functools.partial(SA.short_attention, interpret=False)
        fms = chain(lambda qq, kk2, vv: fn(qq, kk2, vv), (q, k, v))

        def fwd_bwd(qq, kk2, vv):
            def loss(t):
                return jnp.sum(fn(*t).astype(jnp.float32) *
                               g.astype(jnp.float32))
            gr = jax.grad(loss)((qq, kk2, vv))
            return sum(jnp.sum(t.astype(jnp.float32)) for t in gr)

        bms = chain(fwd_bwd, (q, k, v))
        print(json.dumps({name: {"c": c_fix, "fwd_ms": round(fms, 3),
                                 "fwd_bwd_ms": round(bms, 3)}}), flush=True)
        jax.clear_caches()
SA._pick_chunk = orig_pick
