"""Prototype: packed int32 grid [N,64] + scalarized agent state.
Empty-8x8 semantics (walls, goal, forward/turn only matter) + full obs kernel.
Measures the achievable ceiling before refactoring the real engine."""
import time
import jax, jax.numpy as jnp
from functools import partial

N, T = 16384, 256
W = H = 8; WH = W*H; V = 7
key = jax.random.PRNGKey(0)

OBJ_EMPTY, OBJ_WALL, OBJ_GOAL = 1, 2, 8

def pack(t, c, s): return t | (c << 8) | (s << 16)

# build Empty-8x8 grid: walls border, goal at (6,6)
import numpy as np
g = np.full((W, H), pack(OBJ_EMPTY,0,0), np.int32)
g[0,:]=g[-1,:]=g[:,0]=g[:,-1]=pack(OBJ_WALL,5,0)
g[6,6]=pack(OBJ_GOAL,1,0)
G0 = jnp.asarray(g.reshape(WH))

state = dict(
    g=jnp.broadcast_to(G0, (N, WH)).astype(jnp.int32),
    ax=jnp.ones((N,), jnp.int32), ay=jnp.ones((N,), jnp.int32),
    d=jnp.zeros((N,), jnp.int32),
    ct=jnp.zeros((N,), jnp.int32), cc=jnp.zeros((N,), jnp.int32),
    sc=jnp.zeros((N,), jnp.int32),
)
DXS = jnp.array([1,0,-1,0], jnp.int32); DYS = jnp.array([0,1,0,-1], jnp.int32)

def step(s, a):
    ax, ay, d = s['ax'], s['ay'], s['d']
    dx, dy = DXS[d], DYS[d]
    fx = jnp.clip(ax+dx, 0, W-1); fy = jnp.clip(ay+dy, 0, H-1)
    flat = fx*H+fy
    f32 = jnp.take_along_axis(s['g'], flat[:,None], axis=1)[:,0]
    ft = f32 & 0xFF; fst = (f32 >> 16) & 0xFF
    is_left = a==0; is_right = a==1; is_fwd = a==2
    d2 = jnp.where(is_left, (d+3)%4, jnp.where(is_right, (d+1)%4, d))
    can = (ft==OBJ_EMPTY)|(ft==OBJ_GOAL)  # simplified overlap
    mv = is_fwd & can
    ax2 = jnp.where(mv, fx, ax); ay2 = jnp.where(mv, fy, ay)
    hit_goal = is_fwd & (ft==OBJ_GOAL)
    sc = s['sc']+1
    reward = jnp.where(hit_goal, 1.0-0.9*sc.astype(jnp.float32)/256.0, 0.0)
    done = hit_goal | (sc>=256)
    # autoreset (Empty: constant grid, fixed start)
    ax2 = jnp.where(done, 1, ax2); ay2 = jnp.where(done, 1, ay2)
    d2 = jnp.where(done, 0, d2); sc = jnp.where(done, 0, sc)
    g2 = jnp.where(done[:,None], G0, s['g'])
    return dict(g=g2, ax=ax2, ay=ay2, d=d2, ct=s['ct'], cc=s['cc'], sc=sc), reward

def gen_obs(s):
    ax, ay, d = s['ax'], s['ay'], s['d']
    fx_, fy_ = DXS[d], DYS[d]
    rx, ry = -fy_, fx_
    vi = jnp.arange(V, dtype=jnp.int32)[:, None]  # [V,1]
    vj = jnp.arange(V, dtype=jnp.int32)[None, :]  # [1,V]
    # world coords [N,V,V]
    wx = ax[:,None,None] + fx_[:,None,None]*(V-1-vj) - rx[:,None,None]*(V//2-vi)
    wy = ay[:,None,None] + fy_[:,None,None]*(V-1-vj) - ry[:,None,None]*(V//2-vi)
    inb = (wx>=0)&(wx<W)&(wy>=0)&(wy<H)
    flat = jnp.clip(wx,0,W-1)*H + jnp.clip(wy,0,H-1)
    cells = jnp.take_along_axis(s['g'], flat.reshape(N, V*V), axis=1).reshape(N,V,V)
    cells = jnp.where(inb, cells, pack(OBJ_WALL,5,0))
    t = cells & 0xFF; st = (cells >> 16) & 0xFF
    trans = ~((t==OBJ_WALL) | ((t==4)&(st!=0)))  # see_behind
    # process_vis on [V,V,N]? transpose cells to put N minor:
    tr = jnp.transpose(trans, (1,2,0))  # [V,V,N]
    # flood: bottom row up, cummax closed form per row
    idx = jnp.arange(V, dtype=jnp.int32)[:, None]
    def flood_right(m0, tt):  # [V,N] each
        last_vis = jax.lax.cummax(jnp.where(m0, idx, -1), axis=0)
        last_opq = jax.lax.cummax(jnp.where(~tt, idx, -1), axis=0)
        chain = last_vis > last_opq
        shifted = jnp.concatenate([jnp.zeros_like(chain[:1]), chain[:-1]], 0)
        return m0 | shifted
    agent_row = (idx == V//2)  # [V,1]
    up = jnp.zeros((V, N), bool)
    rows = [None]*V
    m0 = jnp.broadcast_to(agent_row, (V, N))
    for j in range(V-1, -1, -1):
        tt = tr[:, j]  # [V,N]
        m = m0 if j == V-1 else up
        m_r = flood_right(m, tt)
        cond_r = (m_r & tt).at[V-1].set(False)
        new_up = cond_r | jnp.concatenate([jnp.zeros_like(cond_r[:1]), cond_r[:-1]], 0)
        m_l = flood_right(m_r[::-1], tt[::-1])[::-1]
        cond_l = (m_l & tt).at[0].set(False)
        new_up = new_up | cond_l | jnp.concatenate([cond_l[1:], jnp.zeros_like(cond_l[:1])], 0)
        rows[j] = m_l
        up = new_up
    vis = jnp.stack(rows, 1)  # [V(i),V(j),N]
    vis = jnp.transpose(vis, (2,0,1))  # [N,V,V]
    img = jnp.where(vis, cells, 0)
    return img

def bench(name, body):
    @jax.jit
    def run(st, key):
        def f(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.randint(ka, (N,), 0, 7, dtype=jnp.int32)
            s, r = body(s, a)
            return (s, k), None
        (s, _), _ = jax.lax.scan(f, (st, key), None, length=T)
        return s
    out = run(state, key); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3):
        out = run(state, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/3
    print(f"{name:34s} {N*T/dt/1e6:8.1f} M steps/s ({dt/T*1e6:7.1f} us/iter)")

bench("packed step only", step)
def step_obs(s, a):
    s, r = step(s, a)
    img = gen_obs(s)
    s = dict(s, sc=s['sc'] + (img[:, 0, 0] & 1))
    return s, r
bench("packed step + obs (used)", step_obs)
