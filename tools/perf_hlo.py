import jax, jax.numpy as jnp
import minigrid_tpu as mg

env = mg.make("MiniGrid-Empty-8x8-v0")
N, T = 16384, 64
key = jax.random.PRNGKey(0)
_, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, N))

step = jax.vmap(lambda s, a: env.step_env(s, a)[0])

@jax.jit
def run(states, key):
    def f(carry, _):
        s, k = carry
        k, ka = jax.random.split(k)
        a = jax.random.randint(ka, (N,), 0, 7, dtype=jnp.int32)
        s = step(s, a)
        return (s, k), None
    (s, _), _ = jax.lax.scan(f, (states, key), None, length=T)
    return s

txt = run.lower(states, key).compile().as_text()
import re
# kernels inside the while body
body = txt[txt.index("%while_body"):] if "%while_body" in txt else txt
lines = body.splitlines()
counts = {}
for l in lines:
    m = re.match(r'\s+%?(\S+?)\.?\d* = ', l)
    if m and 'fusion' in l:
        kind = 'fusion'
        counts[kind] = counts.get(kind, 0) + 1
print("total length:", len(txt))
import collections
ops = collections.Counter()
for l in txt.splitlines():
    m = re.search(r'= \S+ (\w+)\(', l)
    if m: ops[m.group(1)] += 1
print(ops.most_common(20))
# big-buffer ops: look at fusion shapes
for l in txt.splitlines():
    if re.search(r'fusion', l) and re.search(r'16384', l):
        pass
with open('/tmp/step_hlo.txt','w') as f: f.write(txt)
print("saved /tmp/step_hlo.txt")
