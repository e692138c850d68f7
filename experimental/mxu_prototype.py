import sys; sys.path.insert(0, ".")
import time, numpy as np, jax, jax.numpy as jnp
from sventt_tpu.field.modulus import Modulus, FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR
from sventt_tpu.field.limb import (FieldConsts, U64, u64_from_numpy, u64_to_numpy,
    u64_add, u64_sub, u64_select, u64_lt, u64_const_like, mul32_wide, u64_mullo, u64_mulhi)
from sventt_tpu.field.golden import GoldenNTT, bitreverse_permutation

mod = Modulus(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR)
N = mod.modulus
R = 256
B = 1 << 14
NL = 10
rng = np.random.default_rng(0)

perm = bitreverse_permutation(R)
omega = mod.get_root_forward(R)
Rmont = (1 << 64) % N
Mnp = np.zeros((R, R), dtype=object)
for p in range(R):
    base = pow(omega, perm[p], N)
    v = 1
    for j in range(R):
        Mnp[p, j] = v * Rmont % N      # Montgomery form: REDC at the end cancels
        v = v * base % N
M_limbs = np.zeros((NL, R, R), dtype=np.int8)
for i in range(NL):
    M_limbs[i] = ((Mnp >> (7 * i)) & 0x7F).astype(np.int8)
M_l = jax.device_put(jnp.asarray(M_limbs))

xu = rng.integers(0, N, (R, B), dtype=np.uint64)
x = u64_from_numpy(xu)
xh, xl = jax.device_put(x.hi), jax.device_put(x.lo)

C128 = pow(2, 128, N)
NPRIME = pow(N, -1, 1 << 64)   # N^-1 mod 2^64 (for subtractive REDC)

def u64_shl(a: U64, s: int) -> U64:
    if s == 0:
        return a
    if s >= 32:
        return U64((a.lo << np.uint32(s - 32)) if s > 32 else a.lo, jnp.zeros_like(a.lo))
    return U64((a.hi << np.uint32(s)) | (a.lo >> np.uint32(32 - s)), a.lo << np.uint32(s))

def mul_u64_const(a: U64, c: int) -> U64:
    """low 64 of a*c, c constant"""
    return u64_mullo(a, u64_const_like(c, a))

def mxu_ntt(xh, xl, M_l):
    limbs = []
    for i in range(NL):
        lo_bit = 7 * i
        if lo_bit + 7 <= 32:
            v = (xl >> np.uint32(lo_bit)) & np.uint32(0x7F)
        elif lo_bit >= 32:
            v = (xh >> np.uint32(lo_bit - 32)) & np.uint32(0x7F)
        else:
            v = ((xl >> np.uint32(lo_bit)) | (xh << np.uint32(32 - lo_bit))) & np.uint32(0x7F)
        limbs.append(v.astype(jnp.int8))
    X = jnp.concatenate(limbs, axis=1)      # (R, NL*B)

    planes = [None] * (2 * NL - 1)
    for k in range(NL):
        C = jax.lax.dot_general(M_l[k], X, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        Cr = C.reshape(R, NL, B)
        for i in range(NL):
            t = i + k
            blk = Cr[:, i, :]
            planes[t] = blk if planes[t] is None else planes[t] + blk

    # 160-bit value S' = sum_t P_t * 2^(7t): five 32-bit limb accumulators
    # kept as U64 (hi catches carries), final ripple.
    A = [U64(jnp.zeros_like(xh), jnp.zeros_like(xh)) for _ in range(6)]
    for t in range(2 * NL - 1):
        P = planes[t].astype(jnp.uint32)
        pos = 7 * t
        w, sh = pos // 32, pos % 32
        lo = (P << np.uint32(sh)) if sh else P
        A[w] = u64_add(A[w], U64(jnp.zeros_like(lo), lo))
        if sh:
            hi = P >> np.uint32(32 - sh)
            A[w + 1] = u64_add(A[w + 1], U64(jnp.zeros_like(hi), hi))
    # ripple: L[w] final u32 limbs
    L = []
    carry = U64(jnp.zeros_like(xh), jnp.zeros_like(xh))
    for w in range(6):
        s = u64_add(A[w], carry)
        L.append(s.lo)
        carry = U64(jnp.zeros_like(xh), s.hi)
    # T = (L3 L2 L1 L0) + (L5*2^32 + L4) * (2^128 mod N)
    T_lo = U64(L[1], L[0])
    T_hi = U64(L[3], L[2])
    top = U64(L[5], L[4])
    ext = u64_mullo(top, u64_const_like(C128, top))         # top*C128 < 2^34*2^64? C128<N: < 2^98!
    ext_hi = u64_mulhi(top, u64_const_like(C128, top))
    T_lo2 = u64_add(T_lo, ext)
    c0 = u64_lt(T_lo2, ext).astype(jnp.uint32)
    T_hi = u64_add(u64_add(T_hi, ext_hi), U64(jnp.zeros_like(c0), c0))
    # ensure T < N*2^64: conditional subtract N from T_hi while T_hi >= N
    nn = u64_const_like(N, T_hi)
    for _ in range(2):
        cand = u64_sub(T_hi, nn)
        T_hi = u64_select(u64_lt(T_hi, nn), T_hi, cand)
    # subtractive REDC: q = T_lo * N^-1 ; res = (T - q*N)/2^64 = T_hi - hi64(qN),
    # +N on borrow (the library's canonical _redc_finish path).
    q = u64_mullo(T_lo2, u64_const_like(NPRIME, T_lo2))
    qn1 = u64_mulhi(q, nn)
    d = u64_sub(T_hi, qn1)
    fixed = u64_add(d, nn)
    res = u64_select(u64_lt(T_hi, qn1), fixed, d)
    cand = u64_sub(res, nn)
    res = u64_select(u64_lt(res, nn), res, cand)
    return res

f = jax.jit(mxu_ntt)
t0 = time.perf_counter()
out = jax.block_until_ready(f(xh, xl, M_l))
print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
outn = u64_to_numpy(out)
golden = GoldenNTT(R, mod)
ok = True
for col in (0, 99, 7777):
    got = [int(v) for v in outn[:, col]]
    want = golden.forward([int(v) for v in xu[:, col]])
    ok &= got == want
    print(f"golden col {col}:", got == want, flush=True)

def chain_t(iters=20):
    jax.block_until_ready(f(xh, xl, M_l))
    s = (xh, xl)
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = f(s[0], s[1], M_l)
        s = (o.hi, o.lo)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/iters*1e3
dt = chain_t()
pts = R * B
print(f"mxu R={R} B={B}: {dt:.3f} ms -> {pts/dt*1e3/1e9:.2f} Gpts/s, "
      f"{pts*8/2/dt*1e3/1e9:.1f} Gbfly-equiv/s", flush=True)
