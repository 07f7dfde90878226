import numpy as np
H = np.load("/tmp/qpH.npy").astype(np.float64); g = np.load("/tmp/qpg.npy").astype(np.float64)
C = np.load("/tmp/qpC.npy").astype(np.float64); d = np.load("/tmp/qpd.npy").astype(np.float64)
n, m = H.shape[0], C.shape[0]
idx = np.arange(320, n)
H[idx, idx] += 1.0

# redo row scaling the way condense.build SHOULD: undo old scale first is impossible,
# but the saved C,d are post-scale with scale=1/max(rn,1e-9).  Re-equilibrate:
rn = np.abs(C).max(1)
vac = rn < 1e-9
# current rows have rn≈1 (post scale) except vacuous; instead rebuild effective rows by
# re-scaling with a floor applied to the ORIGINAL row norms. Saved scale unknown, so
# approximate: cap |d| by rescaling rows with huge d back down.
fac = np.minimum(1.0, 10.0/np.maximum(np.abs(d), 1e-12))
C2 = C*fac[:,None]; d2 = d*fac

def solve_qp(H, g, C, d, iters, verbose=False):
    v = np.zeros(n); w = np.maximum(d, 1.0); lam = np.ones(m)
    for k in range(iters):
        r_d = H@v + g + C.T@lam
        r_p = C@v + w - d
        mu = w@lam/m
        Dn = np.clip(lam/w, 1e-10, 1e8)
        M = H + (C.T*Dn)@C + 1e-9*np.eye(n)
        cf = np.linalg.cholesky(M)
        def newton(r_c):
            rhs = -r_d + C.T@((r_c - lam*r_p)/w)
            dv = np.linalg.solve(cf.T, np.linalg.solve(cf, rhs))
            dw = -r_p - C@dv
            dlam = (-r_c - lam*dw)/w
            return dv, dw, dlam
        def a2b(x, dx, t):
            msk = dx < 0
            return min(1.0, (t*(-x[msk]/dx[msk])).min()) if msk.any() else 1.0
        dv, dw, dl = newton(w*lam)
        ap, ad = a2b(w, dw, 1.0), a2b(lam, dl, 1.0)
        mu_aff = (w+ap*dw)@(lam+ad*dl)/m
        sigma = np.clip((mu_aff/max(mu,1e-30))**3, 0.0, 1.0)
        r_c = w*lam + dw*dl - max(sigma*mu, 1e-10)
        dv, dw, dl = newton(r_c)
        ap, ad = a2b(w, dw, 0.95), a2b(lam, dl, 0.95)
        v += ap*dv; w += ap*dw; lam += ad*dl
        if verbose: print(f"  k={k} mu={w@lam/m:.3e} ap={ap:.3f} ad={ad:.3f}")
    obj = 0.5*v@H@v + g@v
    rp = np.maximum(C@v - d, 0).max()
    rd = np.abs(H@v + g + C.T@lam).max()
    return obj, rp, rd, w@lam/m, v

for it in (12, 15, 20):
    obj, rp, rd, mu, v = solve_qp(H, g, C2, d2, it)
    print(f"iters={it}: obj={obj:.3f} r_prim={rp:.2e} r_dual={rd:.2e} mu={mu:.2e} smax={v[320:].max():.6f}")
print()
solve_qp(H, g, C2, d2, 20, verbose=True)
