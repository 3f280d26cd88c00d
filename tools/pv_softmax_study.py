"""PV-matmul + softmax cost study for the nt flash kernel (round 3).

After the nt rework the score matmul runs at real-dh cost (0.62 ms at
level 0); the remaining ~3.7 ms per call is softmax + PV. This isolates,
at level-0 shapes (B=80, blk=512, skv=4096, dh=40, bf16):

  pv_lanes    ot = dot(vt (dh,skv), p (blk,skv)) contracting LANES
              (the nt kernel's PV)            measured 2.73 ms
  pv_std      o = dot(p, v (skv,128group))    measured 3.55 ms
  softmax     max+exp+sum+scale               7.10 ms incl. 5.24 baseline
  softmax2    exp2 formulation                identical to exp
  reduce_only read + strided reduce baseline  5.24 ms

P is ONE reusable (blk, skv) input block per batch row — Pallas fetches
unchanged blocks once, so HBM streaming stays ~0.4 ms. NOTE two Mosaic
pitfalls found here (also in the project memory): reading a SCALAR from a
VMEM ref (ref[0,0,0]) crashes this box's remote Mosaic compiler with an
opaque HTTP 500, and so do input tiles with a lane dim < 128 (e.g.
(skv, 40)) — hence no pv_narrow variant.
"""

import jax
jax.config.update("jax_compilation_cache_dir", __import__("os").path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np, functools, time
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, SKV, DH, GROUP, BLK, CELLS = 80, 4096, 40, 128, 512, 8
SQ = BLK * CELLS

def slope_time(run, x, n1=4, n2=24):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(t, n):
        return jax.lax.fori_loop(0, n, lambda i, a: run(a), t)
    def timed(n):
        chain(x, n)[(0,)*x.ndim].block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); r = chain(x, n)
            _ = np.asarray(r[(0,)*r.ndim]); best = min(best, time.perf_counter()-t0)
        return best
    t1, t2 = timed(n1), timed(n2)
    return (t2-t1)/(n2-n1)

key = jax.random.PRNGKey(0)
p_in = jax.random.uniform(key, (B, BLK, SKV), jnp.bfloat16) * 0.001
vt = jax.random.normal(jax.random.fold_in(key, 1), (B, DH, SKV), jnp.bfloat16)
v128 = jax.random.normal(jax.random.fold_in(key, 2), (B, SKV, GROUP), jnp.bfloat16)
flops = 2 * B * SQ * SKV * DH

def bench(name, kernel, b_shape, b_val, flp):
    call = pl.pallas_call(kernel, grid=(B, CELLS),
        in_specs=[pl.BlockSpec((1, BLK, SKV), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1,) + b_shape, lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BLK, 128), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, SQ, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96*1024*1024))
    def step(t):
        y = call(t, b_val)
        s = (jnp.sum(y) * 1e-20 + 1.0).astype(t.dtype)
        return t * s
    try:
        sec = slope_time(step, p_in)
    except Exception as e:
        print(f"{name:10s} FAILED: {str(e)[:120]}"); return
    rate = f"{flp/sec/1e12:6.1f} TF/s" if flp else "   (VPU)"
    print(f"{name:10s} {sec*1e3:8.3f} ms  {rate}", flush=True)

def k_pv_lanes(p_ref, b_ref, o_ref):
    ot = jax.lax.dot_general(b_ref[0], p_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0] = jnp.pad(ot.T, ((0, 0), (0, 128 - DH)))
bench("pv_lanes", k_pv_lanes, (DH, SKV), vt, flops)

def k_pv_std(p_ref, b_ref, o_ref):
    o = jax.lax.dot_general(p_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o
bench("pv_std", k_pv_std, (SKV, GROUP), v128, flops)

def k_softmax(p_ref, b_ref, o_ref):
    s = p_ref[0].astype(jnp.float32) * 1000.0
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    e = e * (1.0 / l)
    o_ref[0] = jnp.sum(e.reshape(BLK, -1, 128), axis=1)
bench("softmax", k_softmax, (DH, SKV), vt, 0)

def k_softmax2(p_ref, b_ref, o_ref):
    s = p_ref[0].astype(jnp.float32) * 1000.0
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2((s - m) * 1.4426950408889634)
    l = jnp.sum(e, axis=-1, keepdims=True)
    e = e * (1.0 / l)
    o_ref[0] = jnp.sum(e.reshape(BLK, -1, 128), axis=1)
bench("softmax2", k_softmax2, (DH, SKV), vt, 0)

def k_noop(p_ref, b_ref, o_ref):
    o_ref[0] = jnp.sum(p_ref[0].astype(jnp.float32).reshape(BLK, -1, 128), axis=1)
bench("reduce_only", k_noop, (DH, SKV), vt, 0)
