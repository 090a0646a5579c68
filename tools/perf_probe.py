import time
import jax, jax.numpy as jnp
import numpy as np

N, T = 16384, 256
W = H = 8; WH = W*H; C = WH*3
key = jax.random.PRNGKey(0)
grid = jax.random.randint(key, (N, W, H, 3), 0, 10, dtype=jnp.int32).astype(jnp.uint8)
flat = jax.random.randint(key, (N,), 0, WH, dtype=jnp.int32)

def bench(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(carry, _):
            out = fn(*carry)
            return out, None
        out, _ = jax.lax.scan(body, a, None, length=T)
        return out
    o = run(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(3):
        o = run(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0)/3
    print(f"{name:44s} {dt/T*1e6:8.1f} us/iter")

iota64 = jnp.arange(WH, dtype=jnp.int32)
iota192 = jnp.arange(C, dtype=jnp.int32)

# (a) fcell read variants
def read_gather(grid, flat):
    f = grid.reshape(N, WH, 3)[jnp.arange(N), flat]  # batched gather
    return grid, flat + f[:, 0].astype(jnp.int32) % WH
def read_onehot(grid, flat):
    gf = grid.reshape(N, C)
    m = (iota192 // 3) == flat[:, None]
    vals = jnp.where(m, gf, 0)
    ch = iota192 % 3
    t = jnp.max(jnp.where(ch == 0, vals, 0), -1)
    c = jnp.max(jnp.where(ch == 1, vals, 0), -1)
    s = jnp.max(jnp.where(ch == 2, vals, 0), -1)
    return grid, (flat + t.astype(jnp.int32) + c.astype(jnp.int32)*0 + s.astype(jnp.int32)*0) % WH
def read_vmap_onehot(grid, flat):
    def one(g, f):
        gf = g.reshape(C)
        m = (iota192 // 3) == f
        vals = jnp.where(m, gf, 0)
        ch = iota192 % 3
        return jnp.stack([jnp.max(jnp.where(ch == k, vals, 0), -1) for k in range(3)])
    f = jax.vmap(one)(grid, flat)
    return grid, (flat + f[:, 0].astype(jnp.int32)) % WH

bench("read: batched gather", read_gather, grid, flat)
bench("read: one-hot reduce (flat192)", read_onehot, grid, flat)
bench("read: vmapped one-hot reduce", read_vmap_onehot, grid, flat)

# (b) write variants
newcell = jnp.array([5, 2, 0], jnp.uint8)
def write_mask_bcast(grid, flat):
    xs = jnp.arange(W)[:, None]; ys = jnp.arange(H)[None, :]
    fx = flat // H; fy = flat % H
    m = (xs[None] == fx[:, None, None]) & (ys[None] == fy[:, None, None])
    g = jnp.where(m[..., None], newcell, grid)
    return g, (flat + g[:, 0, 0, 0].astype(jnp.int32)) % WH
def write_flat(grid, flat):
    gf = grid.reshape(N, C)
    ch = iota192 % 3
    m = (iota192 // 3) == flat[:, None]
    new192 = jnp.where(ch == 0, newcell[0], jnp.where(ch == 1, newcell[1], newcell[2])).astype(jnp.uint8)
    g = jnp.where(m, new192, gf).reshape(N, W, H, 3)
    return g, (flat + g[:, 0, 0, 0].astype(jnp.int32)) % WH
bench("write: [W,H,1] mask broadcast (current)", write_mask_bcast, grid, flat)
bench("write: flat192 iota mask", write_flat, grid, flat)

# (c) 49-cell view gather variants
vidx = jax.random.randint(key, (N, 49), 0, WH, dtype=jnp.int32)
def view_gather(grid, flat):
    gf = grid.reshape(N, WH, 3)
    v = jnp.take_along_axis(gf, vidx[..., None], axis=1)  # [N,49,3]
    return grid, (flat + v[:, 0, 0].astype(jnp.int32)) % WH
def view_onehot_mm(grid, flat):
    gf = grid.reshape(N, WH, 3).astype(jnp.bfloat16)
    oh = (vidx[..., None] == iota64).astype(jnp.bfloat16)  # [N,49,64]
    v = jnp.einsum('nvc,nck->nvk', oh, gf)  # MXU
    return grid, (flat + v[:, 0, 0].astype(jnp.int32)) % WH
def view_pad_slice(grid, flat):
    r = 6
    gp = jnp.pad(grid, ((0,0),(r,r),(r,r),(0,0)), constant_values=2)
    fx = flat // H; fy = flat % H
    def one(g, x, y):
        return jax.lax.dynamic_slice(g, (x, y, 0), (7, 7, 3))
    v = jax.vmap(one)(gp, fx, fy)
    return grid, (flat + v[:, 0, 0, 0].astype(jnp.int32)) % WH
bench("view: take_along_axis 49", view_gather, grid, flat)
bench("view: one-hot bf16 matmul", view_onehot_mm, grid, flat)
bench("view: pad + vmap dynamic_slice", view_pad_slice, grid, flat)
