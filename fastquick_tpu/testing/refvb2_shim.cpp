/* Differential-test shim over the UNMODIFIED reference contamination
 * estimator (VerifyBamID/ContaminationEstimator.cpp + MathGenMin's
 * AmoebaMinimizer).  Compiled at test time with a stub
 * SimplePileupViewer.h (the only htslib-touching dependency; see
 * refvb2_stub/) so the REAL estimator math -- ReadSVDMatrix,
 * ComputeMixLLKs, the Homo/Heter optimization ladder, CalculateLLK0,
 * IsSanityCheckOK -- runs in this image.  Mirrors vb2Main.cpp's
 * driving sequence (VerifyBamID/vb2Main.cpp:157-277). */

#include <cstring>
#include <string>

#include "ContaminationEstimator.h"

extern "C" {

/* out[0..4]: alpha, llk1, llk0, NumMarker, avgDepth;
 * out[5..5+nPC): globalPC; then globalPC2. */
int rv_run(const char *ud, const char *pc, const char *mu,
           const char *bed, const char *pileup, const char *out_prefix,
           int nPC, int heter, int nthread, double eps, double *out)
{
    ContaminationEstimator est(nPC, bed, nthread, eps);
    est.isHeter = heter != 0;
    est.isSanityCheckDisabled = true;
    est.ReadSVDMatrix(ud, pc, mu);
    est.ReadPileup(pileup);
    est.OptimizeLLK(out_prefix);
    out[0] = est.fn.globalAlpha;
    out[1] = est.fn.llk1;
    out[2] = est.fn.llk0;
    out[3] = est.NumMarker;
    out[4] = est.viewer.avgDepth;
    for (int i = 0; i < nPC; ++i) {
        out[5 + i] = est.fn.globalPC[i];
        out[5 + nPC + i] = est.fn.globalPC2[i];
    }
    return 0;
}

}  /* extern "C" */
