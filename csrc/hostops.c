/* Host-side hot-loop kernels for the serving engine.
 *
 * TPU-native counterpart of the reference's native input-prep path
 * (kernels/prepare_inputs/advance_step.cu and the C++-side of its model
 * runners): the per-token/per-step host loops that sit on the engine's
 * critical path — KV slot computation, Pallas work-item scheduling, and
 * the n-gram prompt-lookup scan. Plain C with a ctypes binding
 * (aphrodite_tpu/_native.py); every entry point has a NumPy fallback so
 * the engine runs without a compiler.
 *
 * Build: cc -O3 -shared -fPIC csrc/hostops.c -o <cache>/libhostops.so
 */
#include <stdint.h>
#include <string.h>

/* KV slot mapping for one request's scheduled token range:
 * slots[t0 + i] = block_ids[(start + i) / bs] * bs + (start + i) % bs. */
void fill_slots(int32_t *slots, int64_t t0, int64_t start, int64_t n,
                const int32_t *block_ids, int64_t bs) {
    int64_t p = start;
    int64_t page = p / bs, off = p % bs;
    for (int64_t i = 0; i < n; i++) {
        slots[t0 + i] = (int32_t)(block_ids[page] * bs + off);
        if (++off == bs) { off = 0; page++; }
    }
}

/* Pallas ragged-attention work items (attention/metadata.py
 * build_work_items): fixed-size q blocks per request segment.
 * Returns the item count. */
int64_t build_work_items(const int32_t *seg_starts,
                         const int32_t *seg_counts,
                         const int32_t *seq_lens,
                         int64_t num_reqs, int64_t block_q,
                         int32_t *item_req, int32_t *item_qstart,
                         int32_t *item_qlen, int32_t *item_pos,
                         int32_t *token_item, int32_t *token_row) {
    int64_t n = 0;
    for (int64_t r = 0; r < num_reqs; r++) {
        int64_t qs = seg_starts[r];
        int64_t qe = qs + seg_counts[r];
        int64_t pos0 = (int64_t)seq_lens[r] - (qe - qs);
        int64_t off = 0;
        while (qs + off < qe) {
            int64_t qlen = qe - qs - off;
            if (qlen > block_q) qlen = block_q;
            item_req[n] = (int32_t)r;
            item_qstart[n] = (int32_t)(qs + off);
            item_qlen[n] = (int32_t)qlen;
            item_pos[n] = (int32_t)(pos0 + off);
            for (int64_t j = 0; j < qlen; j++) {
                token_item[qs + off + j] = (int32_t)n;
                token_row[qs + off + j] = (int32_t)j;
            }
            off += qlen;
            n++;
        }
    }
    return n;
}

/* N-gram prompt lookup (spec_decode/ngram.py): most recent earlier
 * occurrence of the longest n<=max_n token suffix; copies up to k
 * following tokens into out. Returns the draft length (0 = no match). */
int64_t ngram_propose(const int32_t *toks, int64_t len, int64_t min_n,
                      int64_t max_n, int64_t k, int32_t *out) {
    if (len < min_n + 1) return 0;
    int64_t top = max_n < len - 1 ? max_n : len - 1;
    for (int64_t n = top; n >= min_n; n--) {
        const int32_t *suffix = toks + len - n;
        /* scan candidate starts right-to-left over toks[0 : len-1-n] */
        for (int64_t i = len - 1 - n; i >= 0; i--) {
            if (memcmp(toks + i, suffix, n * sizeof(int32_t)) == 0) {
                int64_t start = i + n;
                int64_t cnt = len - start < k ? len - start : k;
                if (cnt <= 0) break;
                memcpy(out, toks + start, cnt * sizeof(int32_t));
                return cnt;
            }
        }
    }
    return 0;
}
