import time
import jax, jax.numpy as jnp
import numpy as np

N, T = 16384, 256
W = H = 8; WH = W*H
key = jax.random.PRNGKey(0)
OBJ_EMPTY, OBJ_WALL, OBJ_GOAL = 1, 2, 8
def pack(t,c,s): return t|(c<<8)|(s<<16)
g = np.full((W,H), pack(OBJ_EMPTY,0,0), np.int32)
g[0,:]=g[-1,:]=g[:,0]=g[:,-1]=pack(OBJ_WALL,5,0); g[6,6]=pack(OBJ_GOAL,1,0)
G0 = jnp.asarray(g.reshape(WH))
state = dict(g=jnp.broadcast_to(G0,(N,WH)).astype(jnp.int32),
             ax=jnp.ones((N,),jnp.int32), ay=jnp.ones((N,),jnp.int32),
             d=jnp.zeros((N,),jnp.int32), sc=jnp.zeros((N,),jnp.int32))
DXS=jnp.array([1,0,-1,0],jnp.int32); DYS=jnp.array([0,1,0,-1],jnp.int32)

def bench(name, body, use_actions=True):
    @jax.jit
    def run(st, key):
        def f(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.randint(ka,(N,),0,7,dtype=jnp.int32)
            s = body(s, a)
            return (s, k), None
        (s,_),_ = jax.lax.scan(f,(st,key),None,length=T)
        return s
    o = run(state,key); jax.block_until_ready(o)
    t0=time.perf_counter()
    for i in range(3): o = run(state, jax.random.fold_in(key,i))
    jax.block_until_ready(o)
    dt=(time.perf_counter()-t0)/3
    print(f"{name:40s} {N*T/dt/1e6:8.1f} M ({dt/T*1e6:7.1f} us/iter)")

def scalars_only(s,a):
    ax,ay,d = s['ax'],s['ay'],s['d']
    dx,dy = DXS[d],DYS[d]
    fx=jnp.clip(ax+dx,0,W-1); fy=jnp.clip(ay+dy,0,H-1)
    mv = (a==2)
    return dict(s, ax=jnp.where(mv,fx,ax), ay=jnp.where(mv,fy,ay),
                d=jnp.where(a==0,(d+3)%4,jnp.where(a==1,(d+1)%4,d)), sc=s['sc']+1)
bench("scalar pose math only", scalars_only)

def with_gather(s,a):
    s2 = scalars_only(s,a)
    flat = s2['ax']*H+s2['ay']
    f32 = jnp.take_along_axis(s['g'], flat[:,None], axis=1)[:,0]
    return dict(s2, sc=s2['sc'] + (f32 & 1))
bench("+ take_along_axis gather", with_gather)

def with_gather2(s,a):
    s2 = scalars_only(s,a)
    flat = s2['ax']*H+s2['ay']
    f32 = s['g'][jnp.arange(N), flat]
    return dict(s2, sc=s2['sc'] + (f32 & 1))
bench("+ adv-index gather", with_gather2)

def with_onehot(s,a):
    s2 = scalars_only(s,a)
    flat = s2['ax']*H+s2['ay']
    oh = jnp.arange(WH,dtype=jnp.int32)[None,:] == flat[:,None]
    f32 = jnp.max(jnp.where(oh, s['g'], 0), axis=1)
    return dict(s2, sc=s2['sc'] + (f32 & 1))
bench("+ one-hot max reduce", with_onehot)

def with_blend(s,a):
    s2 = scalars_only(s,a)
    done = s2['sc'] >= 256
    g2 = jnp.where(done[:,None], G0, s['g'])
    return dict(s2, g=g2, sc=jnp.where(done,0,s2['sc']))
bench("+ grid reset blend", with_blend)

def with_write(s,a):
    s2 = scalars_only(s,a)
    flat = s2['ax']*H+s2['ay']
    oh = jnp.arange(WH,dtype=jnp.int32)[None,:] == flat[:,None]
    g2 = jnp.where(oh & (a[:,None]==3), 7, s['g'])
    return dict(s2, g=g2)
bench("+ one-hot grid write", with_write)
rerun = True
print("--- rerun in different order ---")
bench("+ one-hot max reduce (again)", with_onehot)
bench("scalar pose math only (again)", scalars_only)
bench("+ take_along_axis gather (again)", with_gather)
