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

void ct_free(void* p) { free(p); }

}  // extern "C"
