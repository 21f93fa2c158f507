// Incomplete LDL^T factorization with drop tolerance (Crout, 1x1 pivots).
//
// Native (host-side, sequential) replacement for the reference's ILDL
// preconditioner stack, which wraps ILUPACK's Fortran-77 DSYMiluc
// (pcildl.c:46-286). Sparse pointer-chasing factorization is exactly the
// kind of work that belongs in native code next to the TPU compute path:
// it is sequential, branchy and latency-bound.
//
// Algorithm: column-oriented Crout LDL^T over the (symmetrically permuted)
// upper-triangular CSR input. For saddle-point matrices the caller orders
// velocity dofs before pressure dofs, making the matrix symmetric
// quasi-definite so 1x1 pivots suffice (the velocity block eliminates to an
// SPD factor; the pressure Schur complement is negative definite). Tiny
// pivots are safeguarded with a sign-preserving shift. Off-diagonal entries
// with |l_rk * d_k| <= droptol * ||A(:,k)||_inf are dropped (ILUPACK-style
// relative threshold).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// Factor the upper-triangular CSR matrix (diagonal entries must exist).
// Outputs CSC arrays for the strictly-lower unit factor L and diagonal D.
// Returns 0 on success. Caller frees with ildl_free.
int ildl_factor(long n, const long* Ap, const long* Aj, const double* Ax,
                double droptol,
                long** Lp_out, long** Li_out, double** Lx_out,
                double** D_out, long* nnz_out)
{
    std::vector<std::vector<long>>   Lrows(n);  // per column: row indices
    std::vector<std::vector<double>> Lvals(n);
    std::vector<double> D(n, 0.0);

    // Crout linked lists: for each column j already factored, pos[j] points
    // at the next unconsumed entry; llist[k] chains the columns whose next
    // entry has row k.
    std::vector<long> llist(n, -1), lnext(n, -1), pos(n, 0);

    std::vector<double> w(n, 0.0);        // dense accumulator for column k
    std::vector<char>   mark(n, 0);
    std::vector<long>   pattern;
    pattern.reserve(256);

    // column norms of A (inf-norm over the symmetric column)
    std::vector<double> anorm(n, 0.0);
    for (long i = 0; i < n; ++i) {
        for (long t = Ap[i]; t < Ap[i + 1]; ++t) {
            double a = std::fabs(Ax[t]);
            long j = Aj[t];
            if (a > anorm[i]) anorm[i] = a;
            if (a > anorm[j]) anorm[j] = a;
        }
    }

    for (long k = 0; k < n; ++k) {
        // scatter column k of the lower triangle = row k of the upper CSR
        pattern.clear();
        for (long t = Ap[k]; t < Ap[k + 1]; ++t) {
            long r = Aj[t];             // r >= k
            w[r] = Ax[t];
            if (!mark[r]) { mark[r] = 1; pattern.push_back(r); }
        }

        // updates from previous columns j with L[k,j] != 0
        long j = llist[k];
        while (j != -1) {
            long jn = lnext[j];                  // save: we re-link j below
            long pj = pos[j];
            double lkj = Lvals[j][pj];
            double f = D[j] * lkj;
            // w[r] -= f * L[r,j] for r >= k (includes r == k via l_kj)
            w[k] -= f * lkj;
            if (!mark[k]) { mark[k] = 1; pattern.push_back(k); }
            const std::vector<long>&   rj = Lrows[j];
            const std::vector<double>& vj = Lvals[j];
            for (size_t t = pj + 1; t < rj.size(); ++t) {
                long r = rj[t];
                w[r] -= f * vj[t];
                if (!mark[r]) { mark[r] = 1; pattern.push_back(r); }
            }
            // advance column j to its next row
            if ((size_t)(pj + 1) < rj.size()) {
                long rnext = rj[pj + 1];
                pos[j] = pj + 1;
                lnext[j] = llist[rnext];
                llist[rnext] = j;
            }
            j = jn;
        }

        // pivot (sign-preserving safeguard against breakdown)
        double dk = w[k];
        double tiny = 1e-12 * (anorm[k] > 0 ? anorm[k] : 1.0);
        if (std::fabs(dk) < tiny)
            dk = (dk >= 0.0 ? tiny : -tiny);
        D[k] = dk;

        // scale, drop, store column k of L (sorted rows)
        double tol = droptol * (anorm[k] > 0 ? anorm[k] : 1.0);
        std::vector<long>&   rk = Lrows[k];
        std::vector<double>& vk = Lvals[k];
        for (long r : pattern) {
            mark[r] = 0;
            if (r <= k) continue;
            double val = w[r];
            w[r] = 0.0;
            if (std::fabs(val) <= tol) continue;     // drop
            rk.push_back(r);
            vk.push_back(val / dk);
        }
        w[k] = 0.0;
        // sort by row index (insertion into paired arrays)
        for (size_t a = 1; a < rk.size(); ++a) {
            long ri = rk[a]; double vi = vk[a];
            size_t b = a;
            while (b > 0 && rk[b - 1] > ri) {
                rk[b] = rk[b - 1]; vk[b] = vk[b - 1]; --b;
            }
            rk[b] = ri; vk[b] = vi;
        }
        if (!rk.empty()) {
            pos[k] = 0;
            long rfirst = rk[0];
            lnext[k] = llist[rfirst];
            llist[rfirst] = k;
        }
    }

    // pack CSC
    long nnz = 0;
    for (long c = 0; c < n; ++c) nnz += (long)Lrows[c].size();
    long* Lp = (long*)std::malloc((n + 1) * sizeof(long));
    long* Li = (long*)std::malloc((nnz > 0 ? nnz : 1) * sizeof(long));
    double* Lx = (double*)std::malloc((nnz > 0 ? nnz : 1) * sizeof(double));
    double* Dv = (double*)std::malloc(n * sizeof(double));
    if (!Lp || !Li || !Lx || !Dv) return -1;
    long t = 0;
    Lp[0] = 0;
    for (long c = 0; c < n; ++c) {
        std::memcpy(Li + t, Lrows[c].data(), Lrows[c].size() * sizeof(long));
        std::memcpy(Lx + t, Lvals[c].data(),
                    Lvals[c].size() * sizeof(double));
        t += (long)Lrows[c].size();
        Lp[c + 1] = t;
    }
    std::memcpy(Dv, D.data(), n * sizeof(double));
    *Lp_out = Lp; *Li_out = Li; *Lx_out = Lx; *D_out = Dv;
    *nnz_out = nnz + n;    // include the diagonal like the reference's count
    return 0;
}

// In-place solve (L D L^T) x = b with unit-lower CSC L.
void ildl_solve(long n, const long* Lp, const long* Li, const double* Lx,
                const double* D, double* x)
{
    for (long c = 0; c < n; ++c) {          // forward: L y = b
        double xc = x[c];
        for (long t = Lp[c]; t < Lp[c + 1]; ++t)
            x[Li[t]] -= Lx[t] * xc;
    }
    for (long c = 0; c < n; ++c) x[c] /= D[c];
    for (long c = n - 1; c >= 0; --c) {     // backward: L^T z = y
        double s = x[c];
        for (long t = Lp[c]; t < Lp[c + 1]; ++t)
            s -= Lx[t] * x[Li[t]];
        x[c] = s;
    }
}

void ildl_free(void* p) { std::free(p); }

}  // extern "C"
