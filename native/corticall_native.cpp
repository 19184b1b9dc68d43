// corticall_tpu native core: k-mer counting / canonicalization / sort-reduce.
//
// The host-side heavy lifting behind graph construction (the role McCortex's
// C code plays for the reference pipeline, cromwell/wdl/Simulate.wdl:620-666):
// 2-bit pack every window of every read, canonicalize, sort, and reduce to
// (unique canonical kmer, coverage, in-edge mask, out-edge mask) —
// feeding the same struct-of-arrays the numpy path produces, several times
// faster on large read sets.
//
// C ABI for ctypes; no Python headers needed.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Entry {
    uint64_t hi, lo;     // canonical kmer, right-aligned (hi = most significant)
    uint8_t in_mask, out_mask;
};

inline bool entry_less(const Entry& a, const Entry& b) {
    if (a.hi != b.hi) return a.hi < b.hi;
    return a.lo < b.lo;
}

inline bool entry_eq(const Entry& a, const Entry& b) {
    return a.hi == b.hi && a.lo == b.lo;
}

// base codes: A=0 C=1 G=2 T=3, 0xFF invalid
inline void build_lut(uint8_t* lut) {
    memset(lut, 0xFF, 256);
    lut['A'] = lut['a'] = 0;
    lut['C'] = lut['c'] = 1;
    lut['G'] = lut['g'] = 2;
    lut['T'] = lut['t'] = 3;
}

}  // namespace

extern "C" {

// Count kmers over concatenated sequences.
//   bases:      concatenated sequence bytes (ASCII)
//   offsets:    nseqs+1 offsets into bases
//   k:          kmer size (<= 64)
// Outputs (malloc'd; caller frees via ct_free):
//   out_hi/out_lo: canonical kmer halves  (N entries)
//   out_cov:       coverage               (N entries, saturating uint32)
//   out_in/out_out: edge base masks       (N entries)
// Returns N (number of unique canonical kmers), or -1 on error.
int64_t ct_count_kmers(const uint8_t* bases, const int64_t* offsets,
                       int64_t nseqs, int32_t k,
                       uint64_t** out_hi, uint64_t** out_lo,
                       uint32_t** out_cov, uint8_t** out_in,
                       uint8_t** out_out) {
    if (k <= 0 || k > 64) return -1;
    uint8_t lut[256];
    build_lut(lut);

    const int shift_top = 2 * (k - 1);          // position of the first base
    const bool one_word = k <= 32;
    // masks for the (up to) 128-bit packed value
    const uint64_t lo_mask = (k >= 32) ? ~0ULL
                                       : ((1ULL << (2 * k)) - 1);
    const uint64_t hi_mask = (k <= 32) ? 0ULL
                            : ((k == 64) ? ~0ULL : ((1ULL << (2 * (k - 32))) - 1));

    std::vector<Entry> entries;
    entries.reserve(1 << 20);

    for (int64_t s = 0; s < nseqs; s++) {
        const uint8_t* seq = bases + offsets[s];
        const int64_t len = offsets[s + 1] - offsets[s];
        if (len < k) continue;

        // split at invalid bases
        int64_t start = 0;
        while (start <= len - k) {
            // find the next valid run [start, end)
            int64_t end = start;
            while (end < len && lut[seq[end]] != 0xFF) end++;
            if (end - start >= k) {
                // rolling pack over the run
                uint64_t fhi = 0, flo = 0;          // forward, right-aligned
                uint64_t rhi = 0, rlo = 0;          // reverse complement
                for (int64_t i = start; i < end; i++) {
                    const uint64_t b = lut[seq[i]];
                    // forward: shift left 2, append b
                    fhi = ((fhi << 2) | (flo >> 62)) & hi_mask;
                    flo = (flo << 2) | b;
                    if (one_word) flo &= lo_mask;
                    // reverse: shift right 2, prepend (3-b) at the top
                    rlo = (rlo >> 2) | (rhi << 62);
                    rhi >>= 2;
                    const uint64_t cb = 3 - b;
                    if (shift_top >= 64) rhi |= cb << (shift_top - 64);
                    else rlo |= cb << shift_top;
                    if (one_word) { rlo &= lo_mask; rhi = 0; }
                    else { rhi &= hi_mask; }

                    const int64_t pos = i - start + 1;
                    if (pos >= k) {
                        const bool fwd_canon =
                            one_word ? (flo <= rlo)
                                     : (fhi != rhi ? fhi < rhi : flo <= rlo);
                        Entry e;
                        e.hi = fwd_canon ? fhi : rhi;
                        e.lo = fwd_canon ? flo : rlo;
                        e.in_mask = 0;
                        e.out_mask = 0;
                        // prev/next bases in read orientation
                        const int64_t wstart = i - k + 1;
                        const int has_prev = wstart > start;
                        const int has_next = i + 1 < end;
                        const uint64_t pb = has_prev ? lut[seq[wstart - 1]] : 0;
                        const uint64_t nb = has_next ? lut[seq[i + 1]] : 0;
                        if (fwd_canon) {
                            if (has_prev) e.in_mask |= (uint8_t)(1u << pb);
                            if (has_next) e.out_mask |= (uint8_t)(1u << nb);
                        } else {
                            if (has_next) e.in_mask |= (uint8_t)(1u << (3 - nb));
                            if (has_prev) e.out_mask |= (uint8_t)(1u << (3 - pb));
                        }
                        entries.push_back(e);
                    }
                }
            }
            // advance past the invalid byte
            start = end + 1;
            if (end >= len) break;
        }
    }

    std::sort(entries.begin(), entries.end(), entry_less);

    // reduce
    int64_t n = 0;
    const int64_t total = (int64_t)entries.size();
    for (int64_t i = 0; i < total;) {
        int64_t j = i + 1;
        while (j < total && entry_eq(entries[i], entries[j])) j++;
        n++;
        i = j;
    }

    uint64_t* hi = (uint64_t*)malloc(sizeof(uint64_t) * (n ? n : 1));
    uint64_t* lo = (uint64_t*)malloc(sizeof(uint64_t) * (n ? n : 1));
    uint32_t* cov = (uint32_t*)malloc(sizeof(uint32_t) * (n ? n : 1));
    uint8_t* im = (uint8_t*)malloc(n ? n : 1);
    uint8_t* om = (uint8_t*)malloc(n ? n : 1);
    if (!hi || !lo || !cov || !im || !om) return -1;

    int64_t w = 0;
    for (int64_t i = 0; i < total;) {
        int64_t j = i;
        uint64_t c = 0;
        uint8_t mi = 0, mo = 0;
        while (j < total && entry_eq(entries[i], entries[j])) {
            c++;
            mi |= entries[j].in_mask;
            mo |= entries[j].out_mask;
            j++;
        }
        hi[w] = entries[i].hi;
        lo[w] = entries[i].lo;
        cov[w] = (uint32_t)(c > 0xFFFFFFFFULL ? 0xFFFFFFFFULL : c);
        im[w] = mi;
        om[w] = mo;
        w++;
        i = j;
    }

    *out_hi = hi;
    *out_lo = lo;
    *out_cov = cov;
    *out_in = im;
    *out_out = om;
    return n;
}

// Affine-gap Gotoh DP fill (EDNAFULL 5/-4, gap 10+0.5k), exact twin of the
// numpy wavefront in models/sw.py::_gotoh — same init, same tie-breaking
// (gap-extend wins only on strictly greater), same local clamp-to-zero with
// traceback code 3.  Traceback itself stays in Python (it walks one path).
int ct_gotoh_fill(const char* q, int64_t n, const char* s, int64_t m, int local,
                  double* H, int8_t* tbH, int8_t* tbE, int8_t* tbF) {
    const double MATCH = 5.0, MISMATCH = -4.0, GO = 10.0, GE = 0.5;
    const double NEG = -1e30;
    auto code = [](char c) -> int {
        switch (c) {
            case 'A': case 'a': return 0;
            case 'C': case 'c': return 1;
            case 'G': case 'g': return 2;
            case 'T': case 't': return 3;
        }
        return 4;
    };
    const int64_t W = m + 1;
    // the downstream traceback reads only H and the tb matrices; E and F are
    // kept as a rolling row (F) and a running scalar (E) to halve memory
    // traffic — the fill is bandwidth-bound
    double* Fprev = (double*)malloc(sizeof(double) * W);
    for (int64_t j = 0; j <= m; j++) Fprev[j] = NEG;

    // boundaries (row 0 / column 0) — the interior is written by the main loop
    for (int64_t j = 0; j <= m; j++) { tbH[j] = 0; tbE[j] = 0; tbF[j] = 0; }
    for (int64_t i = 1; i <= n; i++) {
        tbH[i * W] = 0; tbE[i * W] = 0; tbF[i * W] = 0;
    }
    if (local) {
        for (int64_t j = 0; j <= m; j++) H[j] = 0.0;
        for (int64_t i = 1; i <= n; i++) H[i * W] = 0.0;
    } else {
        H[0] = 0.0;
        for (int64_t j = 1; j <= m; j++) {
            H[j] = -(GO + GE * (double)j);
            tbH[j] = 1;
            tbE[j] = j > 1 ? 1 : 0;
        }
        for (int64_t i = 1; i <= n; i++) {
            H[i * W] = -(GO + GE * (double)i);
            tbH[i * W] = 2;
            tbF[i * W] = i > 1 ? 1 : 0;
        }
    }
    for (int64_t i = 1; i <= n; i++) {
        const int qc = code(q[i - 1]);
        double e = NEG;  // E[i][0]
        double h_left = H[i * W];
        for (int64_t j = 1; j <= m; j++) {
            const int scd = code(s[j - 1]);
            const double sub = (qc == scd && qc < 4) ? MATCH : MISMATCH;
            const double e_open = h_left - (GO + GE);
            const double e_ext = e - GE;
            e = e_open >= e_ext ? e_open : e_ext;
            tbE[i * W + j] = e_ext > e_open ? 1 : 0;
            const double f_open = H[(i - 1) * W + j] - (GO + GE);
            const double f_ext = (i == 1 ? NEG : Fprev[j]) - GE;
            const double f = f_open >= f_ext ? f_open : f_ext;
            Fprev[j] = f;
            tbF[i * W + j] = f_ext > f_open ? 1 : 0;
            const double diag = H[(i - 1) * W + (j - 1)] + sub;
            double best = diag;
            int8_t tb = 0;
            if (e > best) { best = e; tb = 1; }
            if (f > best) { best = f; tb = 2; }
            if (local && best < 0) { best = 0.0; tb = 3; }
            H[i * W + j] = best;
            tbH[i * W + j] = tb;
            h_left = best;
        }
    }
    free(Fprev);
    return 0;
}

void ct_free(void* p) { free(p); }

}  // extern "C"
