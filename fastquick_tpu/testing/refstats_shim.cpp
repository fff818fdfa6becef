/* Differential-test shim over the UNMODIFIED reference statistics
 * engine (src/StatCollector.cpp + its vendored libStatGen deps).
 *
 * Compiled at test time together with the reference's own sources --
 * src/{StatCollector,RegionList,InsertSizeEstimator}.cpp, misc/bam,
 * misc/vcf, VerifyBamID/statgen and libbwa -- none of which need
 * htslib (only VerifyBamID's pileup reader does, which is why the full
 * FASTQuick binary cannot build in this image while this shim can).
 * No reference code is vendored into the repository.
 *
 * rs_run drives the real thing end to end: bns_restore on the index
 * artifacts this repo writes in the reference formats (.ann/.amb/.pac),
 * StatCollector::RestoreVcfSites on the .SelectedSite.vcf/.gc/
 * .dbSNP.subset.vcf files, AddAlignment over a serialized batch of
 * post-processed read pairs, AddFSC + SetGenomeSize, and ProcessCore,
 * writing every product statistics file for the Python side to
 * byte-diff against the rebuilt collector.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <fstream>
#include <string>

#include "StatCollector.h"
#include "../libbwa/bntseq.h"
#include "../libbwa/bwtaln.h"
#include "../libbwa/bwase.h"

extern "C" {

/* per-end int fields, NF = 12 */
enum { F_TYPE, F_STRAND, F_MAPQ, F_SEQ, F_LEN, F_FULLLEN, F_CLIPLEN,
       F_XFLAG, F_NM, F_NMM, F_NGAPO, F_NGAPE, NF };

int32_t rs_run(const char *ref_path, const char *out_prefix,
               const char *isize_path,
               int32_t flank_len, int32_t flank_long_len,
               int32_t read_len, int32_t num_var_short,
               int32_t num_var_long,
               int64_t genome_size, int64_t n_size,
               int32_t n_pairs, int32_t stride,
               const int8_t *present, const int32_t *ifields,
               const int64_t *pos, const uint8_t *seqs,
               const uint8_t *quals, const char *mds,
               const int64_t *md_off, const int32_t *cigars,
               const int64_t *cig_off, const int32_t *cig_cnt,
               const char *names, const int64_t *name_off,
               const char *fq1, const char *fq2,
               const int64_t *fsc_nums)
{
    bntseq_t *bns = bns_restore(ref_path);
    if (!bns) return -1;
    gap_opt_t *opt = gap_init_opt();
    opt->flank_len = flank_len;
    opt->flank_long_len = flank_long_len;
    opt->read_len = read_len;
    opt->num_variant_short = num_var_short;
    opt->num_variant_long = num_var_long;

    StatCollector sc;
    sc.RestoreVcfSites(ref_path, opt);
    sc.SetGenomeSize(genome_size, n_size);

    std::ofstream fout(isize_path);
    long long total_add = 0;
    bwa_seq_t *ends = (bwa_seq_t *)calloc((size_t)2 * n_pairs,
                                          sizeof(bwa_seq_t));
    for (int e = 0; e < 2 * n_pairs; ++e) {
        if (!present[e]) continue;
        bwa_seq_t *s = ends + e;
        const int32_t *f = ifields + (size_t)e * NF;
        s->type = f[F_TYPE];
        s->strand = f[F_STRAND];
        s->mapQ = f[F_MAPQ];
        s->seQ = f[F_SEQ];
        s->len = f[F_LEN];
        s->full_len = f[F_FULLLEN];
        s->clip_len = f[F_CLIPLEN];
        s->extra_flag = f[F_XFLAG];
        s->nm = f[F_NM];
        s->n_mm = f[F_NMM];
        s->n_gapo = f[F_NGAPO];
        s->n_gape = f[F_NGAPE];
        s->pos = (bwtint_t)pos[e];
        s->seq = (ubyte_t *)malloc((size_t)s->full_len + 1);
        s->qual = (ubyte_t *)calloc((size_t)s->full_len + 1, 1);
        memcpy(s->seq, seqs + (size_t)e * stride, (size_t)s->full_len);
        memcpy(s->qual, quals + (size_t)e * stride, (size_t)s->full_len);
        {
            size_t ml = (size_t)(md_off[e + 1] - md_off[e]);
            s->md = (char *)calloc(ml + 1, 1);
            memcpy(s->md, mds + md_off[e], ml);
        }
        {
            size_t nl = (size_t)(name_off[e + 1] - name_off[e]);
            s->name = (char *)calloc(nl + 1, 1);
            memcpy(s->name, names + name_off[e], nl);
        }
        if (cig_cnt[e] > 0) {
            s->n_cigar = cig_cnt[e];
            s->cigar = (bwa_cigar_t *)malloc(sizeof(bwa_cigar_t)
                                             * (size_t)cig_cnt[e]);
            for (int k = 0; k < cig_cnt[e]; ++k) {
                int32_t op = cigars[(cig_off[e] + k) * 2];
                int32_t ln = cigars[(cig_off[e] + k) * 2 + 1];
                s->cigar[k] = __cigar_create(op, ln);
            }
        }
    }
    for (int i = 0; i < n_pairs; ++i) {
        bwa_seq_t *a = present[2 * i] ? ends + 2 * i : 0;
        bwa_seq_t *b = present[2 * i + 1] ? ends + 2 * i + 1 : 0;
        sc.AddAlignment(bns, a, b, opt, fout, total_add);
    }
    fout.close();

    FileStatCollector fsc(fq1, fq2);
    fsc.NumRead = fsc_nums[0];
    fsc.NumBase = fsc_nums[1];
    fsc.HashFiltered = fsc_nums[2];
    fsc.TotalFiltered = fsc_nums[3];
    fsc.BwaUnmapped = fsc_nums[4];
    fsc.TotalMAPQ = fsc_nums[5];
    fsc.TotalRetained = fsc_nums[6];
    sc.AddFSC(fsc);
    sc.ProcessCore(out_prefix, opt);

    for (int e = 0; e < 2 * n_pairs; ++e) {
        bwa_seq_t *s = ends + e;
        free(s->seq);
        free(s->qual);
        free(s->md);
        free(s->name);
        free(s->cigar);
    }
    free(ends);
    free(opt);
    bns_destroy(bns);
    return 0;
}

}  /* extern "C" */
