import time, numpy as np, jax, jax.numpy as jnp

def bench(name, f, *a, n=10):
    r = f(*a); _ = np.asarray(r)
    t0=time.time()
    for _ in range(n): r = f(*a)
    _ = np.asarray(r)
    print(f"{name}: {(time.time()-t0)/n*1e3:.1f} ms", flush=True)

key = jax.random.PRNGKey(0)
TILES, TS = 2742, 1024          # ~2.8M px as (tiles, 1024)
vals = jax.random.uniform(key, (TILES, TS), dtype=jnp.float32)
idx_local = jax.random.randint(key, (TILES, TS), 0, TS, dtype=jnp.int32)
flatv = vals.reshape(-1)
flat_idx = (idx_local + (jnp.arange(TILES)*TS)[:,None]).reshape(-1)

bench("global gather 2.8M", jax.jit(lambda v,i: v[i].sum()), flatv, flat_idx)
bench("tile take_along 2.8M", jax.jit(lambda v,i: jnp.take_along_axis(v, i, axis=1).sum()), vals, idx_local)

# one-hot segment-min via masked matrix (the MXU/VPU path)
labels = jax.random.randint(key, (TILES, TS), 0, TS, dtype=jnp.int32)
@jax.jit
def onehot_min(v, l):
    m = l[:, :, None] == jnp.arange(TS)[None, None, :]      # (TILES,TS,TS) bool!!
    big = jnp.where(m, v[:, :, None], jnp.inf)
    return big.min(axis=1).sum()
# too big to materialize; chunked over tiles
@jax.jit
def onehot_min_scan(v, l):
    def body(c, xs):
        vv, ll = xs
        m = ll[:, None] == jnp.arange(TS)[None, :]
        return c + jnp.where(m, vv[:, None], jnp.inf).min(axis=0).sum(), None
    out, _ = jax.lax.scan(body, 0.0, (v, l))
    return out
bench("onehot segmin (scan over tiles)", onehot_min_scan, vals, labels, n=3)

# segment_min baseline on same data
segids = (labels + (jnp.arange(TILES)*TS)[:,None]).reshape(-1)
bench("segment_min 2.8M", jax.jit(lambda v,s: jax.ops.segment_min(v, s, num_segments=TILES*TS).min()), flatv, segids)

# batched small matmul MXU check: (TILES,TS) onehot-accumulate via dot
feats = jax.random.uniform(key, (TILES, TS, 4), dtype=jnp.float32)
@jax.jit
def onehot_sum_dot(f, l):
    oh = (l[:, :, None] == jnp.arange(TS)[None, None, :]).astype(jnp.bfloat16)
    return jnp.einsum('tpr,tpc->trc', oh, f.astype(jnp.bfloat16)).sum()
bench("onehot segsum via einsum bf16", onehot_sum_dot, feats, labels, n=2)
