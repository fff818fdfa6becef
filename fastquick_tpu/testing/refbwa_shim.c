/* Differential-test shim over the UNMODIFIED reference libbwa.
 *
 * Compiled at test time together with the reference's own sources
 * (/root/reference/libbwa/\*.c); no reference code is vendored into this
 * repository.  The shim provides a flat C ABI (ctypes-friendly) to:
 *
 *   - build an in-memory forward+reverse FM index pair from raw 2-bit
 *     text, using the reference's own constructors (is_bwt,
 *     bwt_bwtupdate_core, bwt_gen_cnt_table, bwt_cal_sa) in the same
 *     sequence the reference uses (src/BwtIndexer.cpp:716-762 and
 *     libbwa/bwtmisc.c:56-100);
 *   - run bwt_occ / bwt_sa / bwt_cal_width / bwt_match_gap
 *     (libbwa/bwt.h:98, bwt.c:69, bwtaln.c, bwtgap.c:104) on single
 *     reads, per-read exactly as bwa_cal_sa_reg_gap does
 *     (src/BwtMapper.cpp:63-168);
 *   - run bwa_aln2seq_core + bwa_approx_mapQ (libbwa/bwase.c:19-111)
 *     with a caller-controlled drand48 seed;
 *   - run aln_global_core / aln_local_core (libbwa/stdaln.c) and
 *     return path/CIGAR;
 *   - run infer_isize (libbwa/bwape.c:49) on synthetic position arrays.
 *
 * Everything is serialized as flat int32/int64 arrays so the Python
 * side can diff the rebuilt engines read-by-read against the actual
 * compiled C reference.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <stdarg.h>

#include "bwt.h"
#include "bwtaln.h"
#include "bwtgap.h"
#include "bwase.h"
#include "bwape.h"
#include "stdaln.h"

/* The whole reference builds as C++ (-x c++, libbwa/CMakeLists.txt), so
 * functions NOT declared in an extern-"C" header carry C++ linkage;
 * declare/define those outside the extern-"C" block below. */

int is_bwt(ubyte_t *T, int n); /* libbwa/is.c:204 */
/* defined in libbwa/bwtaln.c:73 but not declared in any header */
int bwt_cal_width(const bwt_t *rbwt, int len, const ubyte_t *str,
                  bwt_width_t *width);

/* The reference links these from statgen's Error.cpp; provide minimal
 * stand-ins so the test .so needs only libbwa sources. */
#include "Error.h"

void error(const char *msg, ...)
{
    va_list ap;
    va_start(ap, msg);
    vfprintf(stderr, msg, ap);
    va_end(ap);
    fputc('\n', stderr);
    exit(EXIT_FAILURE);
}

void warning(const char *msg, ...)
{
    va_list ap;
    va_start(ap, msg);
    vfprintf(stderr, msg, ap);
    va_end(ap);
    fputc('\n', stderr);
}

void numerror(const char *msg, ...) { (void)msg; }

void notice(const char *msg, ...) { (void)msg; }

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
    bwt_t *bwt[2]; /* [0]=forward text BWT, [1]=reversed text BWT */
} rb_handle;

static bwt_t *build_one(const uint8_t *text, int32_t n)
{
    bwt_t *bwt = (bwt_t *)calloc(1, sizeof(bwt_t));
    ubyte_t *buf = (ubyte_t *)calloc((size_t)n + 1, 1);
    int64_t i;
    bwt->seq_len = (bwtint_t)n;
    for (i = 0; i < n; ++i) {
        buf[i] = text[i];
        ++bwt->L2[1 + text[i]];
    }
    for (i = 2; i <= 4; ++i) bwt->L2[i] += bwt->L2[i - 1];
    bwt->primary = is_bwt(buf, n);
    bwt->bwt_size = (bwt->seq_len + 15) >> 4;
    bwt->bwt = (uint32_t *)calloc(bwt->bwt_size, 4);
    for (i = 0; i < n; ++i)
        bwt->bwt[i >> 4] |= (uint32_t)buf[i] << ((~i & 15) << 1);
    free(buf);
    bwt_bwtupdate_core(bwt);
    bwt_gen_cnt_table(bwt);
    bwt_cal_sa(bwt, 32);
    return bwt;
}

void *rb_build(const uint8_t *text, int32_t n)
{
    rb_handle *h = (rb_handle *)calloc(1, sizeof(*h));
    uint8_t *rtext = (uint8_t *)malloc((size_t)n);
    int64_t i;
    for (i = 0; i < n; ++i) rtext[i] = text[n - 1 - i];
    h->bwt[0] = build_one(text, n);
    h->bwt[1] = build_one(rtext, n);
    free(rtext);
    return h;
}

void rb_destroy(void *vh)
{
    rb_handle *h = (rb_handle *)vh;
    int d;
    for (d = 0; d < 2; ++d) {
        free(h->bwt[d]->bwt);
        free(h->bwt[d]->sa);
        free(h->bwt[d]);
    }
    free(h);
}

int32_t rb_primary(void *vh, int32_t which)
{
    return (int32_t)((rb_handle *)vh)->bwt[which]->primary;
}

int32_t rb_sa(void *vh, int32_t which, int32_t row)
{
    return (int32_t)bwt_sa(((rb_handle *)vh)->bwt[which], (bwtint_t)row);
}

/* occ(c, k): count of base c in BWT rows [0..k] (closed). */
int32_t rb_occ(void *vh, int32_t which, int32_t k, int32_t c)
{
    return (int32_t)bwt_occ(((rb_handle *)vh)->bwt[which], (bwtint_t)k,
                            (ubyte_t)c);
}

void rb_cal_width(void *vh, int32_t which, int32_t len, const uint8_t *seq,
                  int64_t *w_out, int32_t *bid_out)
{
    bwt_width_t *w =
        (bwt_width_t *)calloc((size_t)len + 1, sizeof(bwt_width_t));
    int i;
    bwt_cal_width(((rb_handle *)vh)->bwt[which], len, seq, w);
    for (i = 0; i <= len; ++i) {
        w_out[i] = (int64_t)w[i].w;
        bid_out[i] = w[i].bid;
    }
    free(w);
}

/* One-read bwt_match_gap with the exact per-read setup of
 * bwa_cal_sa_reg_gap (src/BwtMapper.cpp:63-168).  seq0 = reversed read
 * codes, seq1 = reverse-complement codes.  max_diff must already be
 * resolved by the caller (bwa_cal_maxdiff for fnr mode).  Output rows:
 * [n_mm, n_gapo, n_gape, a, k, l, score] int32.  Returns n_aln
 * (clamped to cap; negative = error). */
int32_t rb_match_gap(void *vh, int32_t len, const uint8_t *seq0,
                     const uint8_t *seq1, int32_t s_mm, int32_t s_gapo,
                     int32_t s_gape, int32_t max_diff, int32_t max_gapo,
                     int32_t max_gape, int32_t indel_end_skip,
                     int32_t max_del_occ, int32_t max_entries,
                     int32_t max_top2, int32_t seed_len,
                     int32_t max_seed_diff, int32_t *out, int32_t cap)
{
    rb_handle *h = (rb_handle *)vh;
    gap_opt_t *opt = gap_init_opt();
    gap_opt_t local_opt;
    gap_stack_t *stack;
    bwt_width_t *w[2], *seed_w[2];
    const ubyte_t *seq[2];
    bwt_aln1_t *aln;
    int n_aln = 0, i, use_seed;

    opt->s_mm = s_mm;
    opt->s_gapo = s_gapo;
    opt->s_gape = s_gape;
    opt->max_diff = max_diff;
    opt->max_gapo = max_gapo;
    opt->max_gape = max_gape;
    opt->indel_end_skip = indel_end_skip;
    opt->max_del_occ = max_del_occ;
    opt->max_entries = max_entries;
    opt->max_top2 = max_top2;
    opt->seed_len = seed_len;
    opt->max_seed_diff = max_seed_diff;
    opt->fnr = 0.0; /* caller resolved max_diff already */
    local_opt = *opt;
    if (local_opt.max_diff < local_opt.max_gapo)
        local_opt.max_gapo = local_opt.max_diff;
    stack = gap_init_stack(local_opt.max_diff, local_opt.max_gapo,
                           local_opt.max_gape, &local_opt);

    use_seed = len > seed_len;
    seq[0] = seq0;
    seq[1] = seq1;
    w[0] = (bwt_width_t *)calloc((size_t)len + 1, sizeof(bwt_width_t));
    w[1] = (bwt_width_t *)calloc((size_t)len + 1, sizeof(bwt_width_t));
    seed_w[0] =
        (bwt_width_t *)calloc((size_t)seed_len + 1, sizeof(bwt_width_t));
    seed_w[1] =
        (bwt_width_t *)calloc((size_t)seed_len + 1, sizeof(bwt_width_t));
    bwt_cal_width(h->bwt[0], len, seq[0], w[0]);
    bwt_cal_width(h->bwt[1], len, seq[1], w[1]);
    local_opt.seed_len = seed_len < len ? seed_len : 0x7fffffff;
    if (use_seed) {
        bwt_cal_width(h->bwt[0], seed_len, seq[0] + (len - seed_len),
                      seed_w[0]);
        bwt_cal_width(h->bwt[1], seed_len, seq[1] + (len - seed_len),
                      seed_w[1]);
    }
    aln = bwt_match_gap(h->bwt, len, seq, w, use_seed ? seed_w : 0,
                        &local_opt, &n_aln, stack);
    for (i = 0; i < n_aln && i < cap; ++i) {
        out[i * 7 + 0] = aln[i].n_mm;
        out[i * 7 + 1] = aln[i].n_gapo;
        out[i * 7 + 2] = aln[i].n_gape;
        out[i * 7 + 3] = aln[i].a;
        out[i * 7 + 4] = (int32_t)aln[i].k;
        out[i * 7 + 5] = (int32_t)aln[i].l;
        out[i * 7 + 6] = aln[i].score;
    }
    free(aln);
    free(w[0]);
    free(w[1]);
    free(seed_w[0]);
    free(seed_w[1]);
    gap_destroy_stack(stack);
    gap_free_opt(opt);
    return n_aln < cap ? n_aln : cap;
}

/* Batch driver with the exact loop shape of bwa_cal_sa_reg_gap
 * (src/BwtMapper.cpp:63-168): ONE gap stack + width buffers reused
 * across all reads (the reference amortizes those allocations per
 * thread, so a per-read-init timing would overstate its cost).  Used to
 * MEASURE the reference search throughput for bench.py's vs_baseline.
 * seqs0/seqs1: n_reads x stride padded code arrays.  max_diffs: per-read
 * resolved max_diff.  Fills n_aln_out per read; returns total hits. */
int64_t rb_match_gap_batch(void *vh, int32_t n_reads, int32_t stride,
                           const uint8_t *seqs0, const uint8_t *seqs1,
                           const int32_t *lens, const int32_t *max_diffs,
                           int32_t s_mm, int32_t s_gapo, int32_t s_gape,
                           int32_t max_gapo, int32_t max_gape,
                           int32_t indel_end_skip, int32_t max_del_occ,
                           int32_t max_entries, int32_t max_top2,
                           int32_t seed_len, int32_t max_seed_diff,
                           int32_t *n_aln_out)
{
    rb_handle *h = (rb_handle *)vh;
    gap_opt_t *opt = gap_init_opt();
    gap_stack_t *stack;
    bwt_width_t *w[2], *seed_w[2];
    const ubyte_t *seq[2];
    int64_t total = 0;
    int r, max_len = 0, batch_max_diff = 0;

    for (r = 0; r < n_reads; ++r) {
        if (lens[r] > max_len) max_len = lens[r];
        if (max_diffs[r] > batch_max_diff) batch_max_diff = max_diffs[r];
    }
    opt->s_mm = s_mm;
    opt->s_gapo = s_gapo;
    opt->s_gape = s_gape;
    opt->max_gapo = max_gapo;
    opt->max_gape = max_gape;
    opt->indel_end_skip = indel_end_skip;
    opt->max_del_occ = max_del_occ;
    opt->max_entries = max_entries;
    opt->max_top2 = max_top2;
    opt->max_seed_diff = max_seed_diff;
    opt->fnr = 0.0;
    stack = gap_init_stack(batch_max_diff,
                           max_gapo < batch_max_diff ? max_gapo
                                                     : batch_max_diff,
                           max_gape, opt);
    w[0] = (bwt_width_t *)calloc((size_t)max_len + 1, sizeof(bwt_width_t));
    w[1] = (bwt_width_t *)calloc((size_t)max_len + 1, sizeof(bwt_width_t));
    seed_w[0] =
        (bwt_width_t *)calloc((size_t)seed_len + 1, sizeof(bwt_width_t));
    seed_w[1] =
        (bwt_width_t *)calloc((size_t)seed_len + 1, sizeof(bwt_width_t));

    for (r = 0; r < n_reads; ++r) {
        gap_opt_t local_opt = *opt;
        int len = lens[r], n_aln = 0, use_seed = len > seed_len, i;
        bwt_aln1_t *aln;
        local_opt.max_diff = max_diffs[r];
        if (local_opt.max_diff < local_opt.max_gapo)
            local_opt.max_gapo = local_opt.max_diff;
        seq[0] = seqs0 + (size_t)r * stride;
        seq[1] = seqs1 + (size_t)r * stride;
        memset(w[0], 0, (size_t)(len + 1) * sizeof(bwt_width_t));
        memset(w[1], 0, (size_t)(len + 1) * sizeof(bwt_width_t));
        bwt_cal_width(h->bwt[0], len, seq[0], w[0]);
        bwt_cal_width(h->bwt[1], len, seq[1], w[1]);
        local_opt.seed_len = seed_len < len ? seed_len : 0x7fffffff;
        if (use_seed) {
            memset(seed_w[0], 0,
                   (size_t)(seed_len + 1) * sizeof(bwt_width_t));
            memset(seed_w[1], 0,
                   (size_t)(seed_len + 1) * sizeof(bwt_width_t));
            bwt_cal_width(h->bwt[0], seed_len, seq[0] + (len - seed_len),
                          seed_w[0]);
            bwt_cal_width(h->bwt[1], seed_len, seq[1] + (len - seed_len),
                          seed_w[1]);
        }
        aln = bwt_match_gap(h->bwt, len, seq, w, use_seed ? seed_w : 0,
                            &local_opt, &n_aln, stack);
        for (i = 0; i < n_aln; ++i) total += aln[i].l - aln[i].k + 1;
        if (n_aln_out) n_aln_out[r] = n_aln;
        free(aln);
    }
    free(w[0]);
    free(w[1]);
    free(seed_w[0]);
    free(seed_w[1]);
    gap_destroy_stack(stack);
    gap_free_opt(opt);
    return total;
}

/* bwa_aln2seq_core + bwa_approx_mapQ differential.  aln_rows: n_aln x 7
 * int32 rows as produced by rb_match_gap.  seed: drand48 seed applied
 * before the call (the sampling stream).  Outputs (int64):
 *   main_out[0..6] = type, c1, c2, n_mm, n_gapo, n_gape, sa
 *   main_out[7]    = strand
 *   main_out[8]    = mapQ (bwa_approx_mapQ with mm = max_diff)
 * multi_out: n_multi x 5 int64 rows [pos(sa row), strand, gap, mm, ref_shift];
 * returns n_multi. */
int32_t rb_aln2seq(int32_t n_aln, const int32_t *aln_rows, int64_t seed,
                   int32_t set_main, int32_t n_multi_req, int32_t len,
                   int32_t max_diff, int64_t *main_out, int64_t *multi_out,
                   int32_t multi_cap)
{
    bwt_aln1_t *aln =
        (bwt_aln1_t *)calloc(n_aln > 0 ? n_aln : 1, sizeof(bwt_aln1_t));
    bwa_seq_t s;
    int i, n_multi;
    for (i = 0; i < n_aln; ++i) {
        aln[i].n_mm = aln_rows[i * 7 + 0];
        aln[i].n_gapo = aln_rows[i * 7 + 1];
        aln[i].n_gape = aln_rows[i * 7 + 2];
        aln[i].a = aln_rows[i * 7 + 3];
        aln[i].k = (bwtint_t)aln_rows[i * 7 + 4];
        aln[i].l = (bwtint_t)aln_rows[i * 7 + 5];
        aln[i].score = aln_rows[i * 7 + 6];
    }
    memset(&s, 0, sizeof(s));
    s.len = s.full_len = s.clip_len = len;
    srand48(seed);
    bwa_aln2seq_core(n_aln, aln, &s, set_main, n_multi_req);
    main_out[0] = s.type;
    main_out[1] = (int64_t)s.c1;
    main_out[2] = (int64_t)s.c2;
    main_out[3] = s.n_mm;
    main_out[4] = s.n_gapo;
    main_out[5] = s.n_gape;
    main_out[6] = (int64_t)s.sa;
    main_out[7] = s.strand;
    main_out[8] = bwa_approx_mapQ(&s, max_diff);
    n_multi = s.n_multi < multi_cap ? s.n_multi : multi_cap;
    for (i = 0; i < n_multi; ++i) {
        multi_out[i * 5 + 0] = (int64_t)s.multi[i].pos;
        multi_out[i * 5 + 1] = s.multi[i].strand;
        multi_out[i * 5 + 2] = s.multi[i].gap;
        multi_out[i * 5 + 3] = s.multi[i].mm;
        multi_out[i * 5 + 4] = 0;
    }
    free(s.multi);
    free(aln);
    return n_multi;
}

/* stdaln banded global alignment (libbwa/stdaln.c aln_global_core) with
 * the reference's aln_param_bwa.  Returns score; fills cigar_out with
 * n_cigar ops packed (op << 14 | len) after path_t -> cigar conversion
 * (stdaln.h:122-128). */
int32_t rb_aln_global(const uint8_t *ref, int32_t ref_len,
                      const uint8_t *read, int32_t read_len, int32_t band,
                      uint16_t *cigar_out, int32_t *n_cigar_out,
                      int32_t cigar_cap)
{
    AlnParam ap = aln_param_bwa;
    path_t *path = (path_t *)calloc((size_t)ref_len + read_len,
                                    sizeof(path_t));
    int path_len = 0, score, n_cigar = 0, i;
    uint32_t *cigar32;
    ap.band_width = band;
    score = aln_global_core((ubyte_t *)ref, ref_len, (ubyte_t *)read,
                            read_len, &ap, path, &path_len);
    cigar32 = aln_path2cigar32(path, path_len, &n_cigar);
    for (i = 0; i < n_cigar && i < cigar_cap; ++i)
        cigar_out[i] = (uint16_t)((cigar32[i] & 0xf) << 14 |
                                  (cigar32[i] >> 4 & 0x3fff));
    *n_cigar_out = n_cigar < cigar_cap ? n_cigar : cigar_cap;
    free(cigar32);
    free(path);
    return score;
}

/* stdaln banded local alignment (aln_local_core, as bwa_sw_core calls
 * it at libbwa/bwape.c:382).  Returns score; fills [beg1, end1] x
 * [beg2, end2] with the 1-based subsequence coordinates (path runs
 * end -> begin: path[0] is the end cell, path[path_len-1] the start). */
int32_t rb_aln_local(const uint8_t *ref, int32_t ref_len,
                     const uint8_t *read, int32_t read_len, int32_t band,
                     int32_t *beg1, int32_t *end1, int32_t *beg2,
                     int32_t *end2)
{
    AlnParam ap = aln_param_bwa;
    path_t *path = (path_t *)calloc((size_t)ref_len + read_len,
                                    sizeof(path_t));
    int score, path_len = 0;
    ap.band_width = band;
    score = aln_local_core((ubyte_t *)ref, ref_len, (ubyte_t *)read,
                           read_len, &ap, path, &path_len, 1, 0);
    if (path_len > 0) {
        *end1 = path[0].i;
        *end2 = path[0].j;
        *beg1 = path[path_len - 1].i;
        *beg2 = path[path_len - 1].j;
    } else {
        *beg1 = *end1 = *beg2 = *end2 = 0;
    }
    free(path);
    return score;
}

/* Full SE SAM differential: drive the reference's own post-processing
 * chain on a batch -- bwa_aln2seq_core (one srand48(seed) stream across
 * the whole batch, as BwtMapper seeds once per mapper), the
 * bwa_cal_pac_pos position/mapQ resolution (bwase.c:150-178, both BWTs
 * resident), bwa_refine_gapped incl. bwa_cal_md1 + bwa_correct_trimmed
 * (bwase.c:339-417), then bwa_print_sam1 (bwase.c:455) to stdout.  The
 * Python caller captures fd 1 and diffs each SAM line's fields against
 * the rebuilt pipeline.
 *
 * seqs/rseqs: stride-padded reversed / revcomp codes; quals: ASCII
 * phred+33 stride-padded; aln_rows as in rb_match_gap output. */
int32_t rb_se_sam(void *vh, const uint8_t *text, int32_t n, int64_t seed,
                  int32_t n_seqs, int32_t stride, const uint8_t *seqs,
                  const uint8_t *rseqs, const char *quals,
                  const int32_t *lens, const int32_t *max_diffs,
                  const int32_t *aln_off, const int32_t *aln_cnt,
                  const int32_t *aln_rows, int32_t n_multi, int32_t mode,
                  int32_t max_top2)
{
    rb_handle *h = (rb_handle *)vh;
    bntseq_t *bns = (bntseq_t *)calloc(1, sizeof(bntseq_t));
    ubyte_t *pacseq = (ubyte_t *)calloc((size_t)n / 4 + 1, 1);
    bwa_seq_t *ss = (bwa_seq_t *)calloc((size_t)n_seqs, sizeof(bwa_seq_t));
    int64_t i;
    int r, j;

    for (i = 0; i < n; ++i)
        pacseq[i >> 2] |= (ubyte_t)(text[i] << ((~i & 3) << 1));
    bns->l_pac = n;
    bns->n_seqs = 1;
    bns->anns = (bntann1_t *)calloc(1, sizeof(bntann1_t));
    bns->anns[0].name = strdup("ref");
    bns->anns[0].offset = 0;
    bns->anns[0].len = n;
    bns->n_holes = 0;
    bns->ambs = 0;

    srand48((long)seed);
    for (r = 0; r < n_seqs; ++r) {
        bwa_seq_t *s = ss + r;
        int len = lens[r], cnt = aln_cnt[r];
        const int32_t *rows = aln_rows + (size_t)aln_off[r] * 7;
        bwt_aln1_t *aln =
            (bwt_aln1_t *)calloc(cnt > 0 ? cnt : 1, sizeof(bwt_aln1_t));
        s->name = (char *)malloc(16);
        sprintf(s->name, "r%d", r);
        s->len = s->full_len = s->clip_len = len;
        s->seq = (ubyte_t *)malloc((size_t)len);
        s->rseq = (ubyte_t *)malloc((size_t)len);
        memcpy(s->seq, seqs + (size_t)r * stride, (size_t)len);
        memcpy(s->rseq, rseqs + (size_t)r * stride, (size_t)len);
        s->qual = (ubyte_t *)calloc((size_t)len + 1, 1);
        memcpy(s->qual, quals + (size_t)r * stride, (size_t)len);
        for (j = 0; j < cnt; ++j) {
            aln[j].n_mm = rows[j * 7 + 0];
            aln[j].n_gapo = rows[j * 7 + 1];
            aln[j].n_gape = rows[j * 7 + 2];
            aln[j].a = rows[j * 7 + 3];
            aln[j].k = (bwtint_t)rows[j * 7 + 4];
            aln[j].l = (bwtint_t)rows[j * 7 + 5];
            aln[j].score = rows[j * 7 + 6];
        }
        bwa_aln2seq_core(cnt, aln, s, 1, n_multi);
        free(aln);
    }
    /* bwa_cal_pac_pos with both BWTs resident (bwase.c:150-178) */
    for (r = 0; r < n_seqs; ++r) {
        bwa_seq_t *s = ss + r;
        bwa_cal_pac_pos_core(h->bwt[0], h->bwt[1], s, max_diffs[r], 0.0f);
        for (j = 0; j < s->n_multi; ++j) {
            bwt_multi1_t *q = s->multi + j;
            if (q->strand)
                q->pos = bwt_sa(h->bwt[0], q->pos);
            else
                q->pos = h->bwt[1]->seq_len
                         - (bwt_sa(h->bwt[1], q->pos) + s->len);
        }
    }
    free(bwa_refine_gapped(bns, n_seqs, ss, pacseq, 0));
    for (r = 0; r < n_seqs; ++r)
        bwa_print_sam1(bns, ss + r, 0, mode, max_top2);
    fflush(stdout);

    for (r = 0; r < n_seqs; ++r) {
        bwa_seq_t *s = ss + r;
        free(s->name);
        free(s->seq);
        free(s->rseq);
        free(s->qual);
        free(s->md);
        free(s->cigar);
        for (j = 0; j < s->n_multi; ++j) free(s->multi[j].cigar);
        free(s->multi);
    }
    free(ss);
    free(bns->anns[0].name);
    free(bns->anns);
    free(bns);
    return 0;
}

/* infer_isize differential (libbwa/bwape.c:49).  For n pairs, takes
 * pos/strand/len/mapQ/type arrays per end and runs the reference's
 * quartile + Bayesian-high-bound estimator.  Outputs
 * [avg, std, low, high, high_bayesian, ap_prior] as doubles; returns
 * the C return code (-1 = failed inference). */
int32_t rb_infer_isize(int32_t n, const int64_t *pos0, const int64_t *pos1,
                       const int32_t *strand0, const int32_t *strand1,
                       const int32_t *len0, const int32_t *len1,
                       const int32_t *mapq0, const int32_t *mapq1,
                       const int32_t *type0, const int32_t *type1,
                       double ap_prior, int64_t L, double *out6)
{
    bwa_seq_t *a = (bwa_seq_t *)calloc(n > 0 ? n : 1, sizeof(bwa_seq_t));
    bwa_seq_t *b = (bwa_seq_t *)calloc(n > 0 ? n : 1, sizeof(bwa_seq_t));
    bwa_seq_t *seqs[2];
    isize_info_t ii;
    int i, ret;
    for (i = 0; i < n; ++i) {
        a[i].pos = (bwtint_t)pos0[i];
        a[i].strand = strand0[i];
        a[i].len = a[i].full_len = a[i].clip_len = len0[i];
        a[i].mapQ = mapq0[i];
        a[i].type = type0[i];
        b[i].pos = (bwtint_t)pos1[i];
        b[i].strand = strand1[i];
        b[i].len = b[i].full_len = b[i].clip_len = len1[i];
        b[i].mapQ = mapq1[i];
        b[i].type = type1[i];
    }
    seqs[0] = a;
    seqs[1] = b;
    memset(&ii, 0, sizeof(ii));
    ret = infer_isize(n, seqs, &ii, ap_prior, L);
    out6[0] = ii.avg;
    out6[1] = ii.std;
    out6[2] = (double)ii.low;
    out6[3] = (double)ii.high;
    out6[4] = (double)ii.high_bayesian;
    out6[5] = ii.ap_prior;
    free(a);
    free(b);
    return ret;
}

/* pairing differential (libbwa/bwape.c:119-215, BWA_PET_STD).
 * alnN: nN x 7 int32 rows per end; arr: pre-built pos<<32|idx<<1|end
 * keys; p_fields: 2 x 10 int64 in/out rows
 * [pos, strand, mapQ, seQ, extra_flag, n_mm, n_gapo, n_gape, score,
 *  full_len]; ii6: [avg, std, low, high, high_bayesian, ap_prior].
 * Returns cnt_chg. */
int32_t rb_pairing(const int32_t *aln0, int32_t n0, const int32_t *aln1,
                   int32_t n1, const uint64_t *arr, int32_t n_arr,
                   int64_t *p_fields, int32_t s_mm, int32_t max_isize,
                   const double *ii6)
{
    pe_data_t d;
    pe_opt_t *popt = bwa_init_pe_opt();
    isize_info_t ii;
    bwa_seq_t s[2];
    bwa_seq_t *p[2];
    const int32_t *rows[2];
    int32_t ns[2];
    int e, i, cnt;

    bwase_initialize(); /* fills g_log_n used by the pair mapQ rules */
    memset(&d, 0, sizeof(d));
    rows[0] = aln0;
    rows[1] = aln1;
    ns[0] = n0;
    ns[1] = n1;
    for (e = 0; e < 2; ++e) {
        d.aln[e].n = d.aln[e].m = ns[e];
        d.aln[e].a = (bwt_aln1_t *)calloc(ns[e] > 0 ? ns[e] : 1,
                                          sizeof(bwt_aln1_t));
        for (i = 0; i < ns[e]; ++i) {
            d.aln[e].a[i].n_mm = rows[e][i * 7 + 0];
            d.aln[e].a[i].n_gapo = rows[e][i * 7 + 1];
            d.aln[e].a[i].n_gape = rows[e][i * 7 + 2];
            d.aln[e].a[i].a = rows[e][i * 7 + 3];
            d.aln[e].a[i].k = (bwtint_t)rows[e][i * 7 + 4];
            d.aln[e].a[i].l = (bwtint_t)rows[e][i * 7 + 5];
            d.aln[e].a[i].score = rows[e][i * 7 + 6];
        }
    }
    d.arr.n = d.arr.m = n_arr;
    d.arr.a = (uint64_t *)malloc((n_arr > 0 ? n_arr : 1) * 8);
    memcpy(d.arr.a, arr, (size_t)n_arr * 8);
    memset(s, 0, sizeof(s));
    for (e = 0; e < 2; ++e) {
        int64_t *f = p_fields + e * 10;
        s[e].pos = (bwtint_t)f[0];
        s[e].strand = (int)f[1];
        s[e].mapQ = (int)f[2];
        s[e].seQ = (int)f[3];
        s[e].extra_flag = (int)f[4];
        s[e].n_mm = (int)f[5];
        s[e].n_gapo = (int)f[6];
        s[e].n_gape = (int)f[7];
        s[e].score = (int)f[8];
        s[e].len = s[e].full_len = s[e].clip_len = (int)f[9];
        p[e] = &s[e];
    }
    popt->max_isize = max_isize;
    popt->type = BWA_PET_STD;
    memset(&ii, 0, sizeof(ii));
    ii.avg = ii6[0];
    ii.std = ii6[1];
    ii.low = (bwtint_t)ii6[2];
    ii.high = (bwtint_t)ii6[3];
    ii.high_bayesian = (bwtint_t)ii6[4];
    ii.ap_prior = ii6[5];
    cnt = pairing(p, &d, popt, s_mm, &ii);
    for (e = 0; e < 2; ++e) {
        int64_t *f = p_fields + e * 10;
        f[0] = (int64_t)s[e].pos;
        f[1] = s[e].strand;
        f[2] = s[e].mapQ;
        f[3] = (int64_t)s[e].seQ;
        f[4] = s[e].extra_flag;
        f[5] = s[e].n_mm;
        f[6] = s[e].n_gapo;
        f[7] = s[e].n_gape;
        f[8] = s[e].score;
        f[9] = s[e].len;
    }
    free(d.aln[0].a);
    free(d.aln[1].a);
    free(d.arr.a);
    free(popt);
    return cnt;
}

#ifdef __cplusplus
} /* extern "C" */
#endif
