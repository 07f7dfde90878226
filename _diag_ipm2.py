import numpy as np

H0 = np.load("/tmp/qpH.npy").astype(np.float64); g0 = np.load("/tmp/qpg.npy").astype(np.float64)
C0 = np.load("/tmp/qpC.npy").astype(np.float64); d0 = np.load("/tmp/qpd.npy").astype(np.float64)
n, m = H0.shape[0], C0.shape[0]
idx = np.arange(320, n)
H0 = H0.copy(); H0[idx, idx] += 1.0   # slack curvature

def ruiz(H, g, C, d, iters=10):
    D = np.ones(n); E = np.ones(m)
    for _ in range(iters):
        cn = np.maximum(np.abs(H).max(0), np.abs(C).max(0))
        dd = 1/np.sqrt(np.maximum(cn, 1e-12)); dd = np.clip(dd, 1e-4, 1e4)
        rn = np.abs(C).max(1)
        ee = 1/np.sqrt(np.maximum(rn, 1e-12)); ee = np.clip(ee, 1e-4, 1e4)
        H = H*dd[:,None]*dd[None,:]; g = g*dd
        C = C*ee[:,None]*dd[None,:]; d = d*ee
        D *= dd; E *= ee
    cs = 1.0/max(np.abs(H).max()/10, np.abs(g).max(), 1e-8)
    return H*cs, g*cs, C, d, D, E, cs

def solve2(H, g, C, d, iters, sig_fix=None, verbose=False):
    Hs, gs, Cs, ds, D, E, cs = ruiz(H, g, C, d)
    v = np.zeros(n); w = np.maximum(ds, 1.0); lam = np.ones(m)
    for k in range(iters):
        r_d = Hs@v + gs + Cs.T@lam
        r_p = Cs@v + w - ds
        mu = w@lam/m
        Dn = np.clip(lam/w, 1e-10, 1e8)
        M = Hs + (Cs.T*Dn)@Cs + 1e-9*np.eye(n)
        cf = np.linalg.cholesky(M)
        def newton(r_c):
            rhs = -r_d + Cs.T@((r_c - lam*r_p)/w)
            dv = np.linalg.solve(cf.T, np.linalg.solve(cf, rhs))
            dw = -r_p - Cs@dv
            dlam = (-r_c - lam*dw)/w
            return dv, dw, dlam
        def a2b(x, dx, t):
            msk = dx < 0
            return min(1.0, (t*(-x[msk]/dx[msk])).min()) if msk.any() else 1.0
        dv, dw, dl = newton(w*lam)
        a = min(a2b(w, dw, 1.0), a2b(lam, dl, 1.0))
        mu_aff = (w+a*dw)@(lam+a*dl)/m
        sigma = np.clip((mu_aff/max(mu,1e-30))**3, 0.01, 1) if sig_fix is None else sig_fix
        corr = np.clip(dw*dl, -10*mu, 10*mu)   # safeguarded corrector
        r_c = w*lam + corr - max(sigma*mu, 1e-10)
        dv, dw, dl = newton(r_c)
        a = min(a2b(w, dw, 0.99), a2b(lam, dl, 0.99))
        v += a*dv; w += a*dw; lam += a*dl
        if verbose: print(f"  k={k} mu={w@lam/m:.3e} a={a:.3f}")
    v_out = D*v
    lam_out = E*lam/cs
    obj = 0.5*v_out@H@v_out + g@v_out
    rp = np.maximum(C@v_out - d, 0).max()
    rd = np.abs(H@v_out + g + C.T@lam_out).max()
    return obj, rp, rd, (w@lam/m), v_out

for it in (12, 15, 20, 25):
    obj, rp, rd, mu, v = solve2(H0, g0, C0, d0, it)
    print(f"iters={it}: obj={obj:.3f} r_prim={rp:.2e} r_dual={rd:.2e} mu_scaled={mu:.2e} smax={v[320:].max():.6f}")
