// Native PELL plan builder for ginkgo_tpu (ops/spmv_pallas.PellPlan).
//
// Reference analog: the reference sizes its per-format GPU layouts with
// device kernels (e.g. cuda/matrix/csr_kernels.cu load-balance srow
// construction, common/.../format conversion kernels); here the layout
// planning is a host-side setup pass.  The numpy implementation makes
// ~20 full-array passes (index math, np.unique sort, cumsums) which
// collapse on hosts with degraded memory bandwidth; this builder fuses
// them into one decode pass + one index sort + two walks.
//
// C ABI (two-phase, opaque handle):
//   gko_pell_plan_build(indptr, indices, n_rows, n_cols, G, S, &handle)
//   gko_pell_plan_sizes(handle, &total_slots, &n_steps, &NT, &NP)
//   gko_pell_plan_fill(handle, gslot, srow, lane, q, bases, tile_of_step)
//   gko_pell_plan_free(handle)
// The caller allocates the fill outputs from the sizes: gslot/srow/lane/q
// are per-nonzero (int64/int32/int32/int32), bases is (total_slots,)
// int32, tile_of_step is (n_steps,) int32.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <new>
#include <vector>

namespace {

struct PlanState {
    int64_t n_rows = 0, n_cols = 0, nnz = 0;
    int32_t G = 4, S = 8;
    int64_t NT = 0, NP = 0, NB = 0;
    int64_t total_slots = 0, n_steps = 0;
    std::vector<int64_t> K;         // per-nnz slot key
    std::vector<int64_t> order;     // nnz indices sorted by K
    std::vector<int64_t> slot_off;  // per-tile padded slot offset
    std::vector<int64_t> steps_t;   // per-tile step count
    std::vector<int64_t> K_t;       // per-tile UNPADDED slot count
};

namespace {

// recompute the G-dependent padding (steps_t / slot_off / totals) from
// the stored per-tile slot counts — O(NT), no re-sort; the auto-G
// chooser evaluates several G values this way before filling
void retarget_padding(PlanState* st, int32_t G) {
    st->G = G;
    int64_t steps_total = 0;
    st->slot_off.assign(static_cast<size_t>(st->NT) + 1, 0);
    st->steps_t.resize(static_cast<size_t>(st->NT));
    for (int64_t t = 0; t < st->NT; ++t) {
        const int64_t steps =
            std::max<int64_t>((st->K_t[t] + G - 1) / G, 1);
        st->steps_t[t] = steps;
        st->slot_off[t + 1] = st->slot_off[t] + steps * G;
        steps_total += steps;
    }
    st->total_slots = st->slot_off[static_cast<size_t>(st->NT)];
    st->n_steps = steps_total;
}

}  // namespace

}  // namespace

extern "C" {

struct GkoPellPlan;  // opaque

int gko_pell_plan_build(const int64_t* indptr, const int64_t* indices,
                        int64_t n_rows, int64_t n_cols, int32_t G,
                        int32_t S, GkoPellPlan** out) {
    if (!indptr || !out || n_rows < 0 || n_cols < 0 || G < 1 || S < 1) {
        return 1;
    }
    auto* st = new (std::nothrow) PlanState();
    if (!st) return 2;
    st->n_rows = n_rows;
    st->n_cols = n_cols;
    st->G = G;
    st->S = S;
    const int64_t tile_rows = static_cast<int64_t>(S) * 128;
    const int64_t pad = S - 1;
    st->NT = std::max<int64_t>((n_rows + tile_rows - 1) / tile_rows, 1);
    st->NP = std::max<int64_t>((n_cols + 127) / 128, 1);
    st->NB = st->NP + 2 * pad + 1;
    const int64_t nnz = n_rows ? indptr[n_rows] : 0;
    st->nnz = nnz;

    // pass 1: fused per-nnz key computation with run-local occurrence
    // (cols sorted within rows, so (row, panel) runs are contiguous)
    st->K.resize(static_cast<size_t>(nnz));
    for (int64_t r = 0; r < n_rows; ++r) {
        const int64_t t = r / tile_rows;
        const int64_t s = (r >> 7) % S;
        int64_t prev_p = INT64_MIN, occ = 0;
        for (int64_t k = indptr[r]; k < indptr[r + 1]; ++k) {
            const int64_t col = indices[k];
            const int64_t p = col >> 7;
            occ = (p == prev_p) ? occ + 1 : 0;
            prev_p = p;
            const int64_t base = p - s + pad;
            st->K[static_cast<size_t>(k)] =
                (t * st->NB + base) * 128 + occ;
        }
    }

    // sort nnz indices by key (the only O(nnz log nnz) step)
    st->order.resize(static_cast<size_t>(nnz));
    for (int64_t i = 0; i < nnz; ++i) st->order[i] = i;
    const int64_t* Kp = st->K.data();
    std::sort(st->order.begin(), st->order.end(),
              [Kp](int64_t a, int64_t b) { return Kp[a] < Kp[b]; });

    // walk 1: unique-slot counts per tile
    std::vector<int64_t> K_t(static_cast<size_t>(st->NT), 0);
    int64_t prevK = INT64_MIN;
    for (int64_t j = 0; j < nnz; ++j) {
        const int64_t key = Kp[st->order[j]];
        if (key != prevK) {
            prevK = key;
            const int64_t t = key / (st->NB * 128);
            ++K_t[static_cast<size_t>(t)];
        }
    }
    st->K_t = std::move(K_t);
    retarget_padding(st, G);
    *out = reinterpret_cast<GkoPellPlan*>(st);
    return 0;
}

int gko_pell_plan_retarget(GkoPellPlan* h, int32_t G) {
    auto* st = reinterpret_cast<PlanState*>(h);
    if (!st || G < 1) return 1;
    retarget_padding(st, G);
    return 0;
}

void gko_pell_plan_sizes(const GkoPellPlan* h, int64_t* total_slots,
                         int64_t* n_steps, int64_t* NT, int64_t* NP) {
    const auto* st = reinterpret_cast<const PlanState*>(h);
    if (!st) return;
    if (total_slots) *total_slots = st->total_slots;
    if (n_steps) *n_steps = st->n_steps;
    if (NT) *NT = st->NT;
    if (NP) *NP = st->NP;
}

int gko_pell_plan_fill(const GkoPellPlan* h, const int64_t* indptr,
                       const int64_t* indices, int64_t* gslot,
                       int32_t* srow, int32_t* lane, int32_t* q,
                       int32_t* bases, int32_t* tile_of_step) {
    const auto* st = reinterpret_cast<const PlanState*>(h);
    if (!st || !indptr || !gslot || !bases || !tile_of_step) return 1;
    const int64_t nnz = st->nnz;
    const int64_t tile_rows = static_cast<int64_t>(st->S) * 128;

    // walk 2 over sorted keys: assign slot ids, record bases
    std::memset(bases, 0, sizeof(int32_t) *
                static_cast<size_t>(st->total_slots));
    int64_t prevK = INT64_MIN, cur_t = -1, slot_in_t = -1, slot = -1;
    for (int64_t j = 0; j < nnz; ++j) {
        const int64_t k = st->order[j];
        const int64_t key = st->K[static_cast<size_t>(k)];
        if (key != prevK) {
            prevK = key;
            const int64_t t = key / (st->NB * 128);
            const int64_t base = (key / 128) % st->NB;
            if (t != cur_t) {
                cur_t = t;
                slot_in_t = 0;
            } else {
                ++slot_in_t;
            }
            slot = st->slot_off[static_cast<size_t>(t)] + slot_in_t;
            bases[slot] = static_cast<int32_t>(base);
        }
        gslot[k] = slot;
    }

    // per-nnz sublane / lane / packed column (one decode pass)
    if (srow && lane && q) {
        for (int64_t r = 0; r < st->n_rows; ++r) {
            const int32_t s =
                static_cast<int32_t>((r >> 7) % st->S);
            const int32_t l = static_cast<int32_t>(r & 127);
            for (int64_t k = indptr[r]; k < indptr[r + 1]; ++k) {
                srow[k] = s;
                lane[k] = l;
                q[k] = static_cast<int32_t>(indices[k] & 127);
            }
        }
    }
    (void)tile_rows;

    // tile_of_step
    int64_t pos = 0;
    for (int64_t t = 0; t < st->NT; ++t) {
        for (int64_t s = 0; s < st->steps_t[static_cast<size_t>(t)];
             ++s) {
            tile_of_step[pos++] = static_cast<int32_t>(t);
        }
    }
    return 0;
}

void gko_pell_plan_free(GkoPellPlan* h) {
    delete reinterpret_cast<PlanState*>(h);
}

}  // extern "C"
