/* Test-shim stand-in for the reference's SimplePileupViewer.h.
 *
 * The real header drags in htslib (absent in this image) for the
 * BAM-mpileup path, which the contamination-estimator differential
 * never exercises.  This stub keeps the EXACT interface + text-pileup
 * semantics ContaminationEstimator.{h,cpp} and the shim consume:
 * the reference's own ReadPileup stores the RAW seq/qual strings per
 * marker gated by the bed table, merging duplicated lines and
 * accumulating numBases/effectiveNumSite/avgDepth
 * (reference VerifyBamID/SimplePileupViewer.cpp ReadPileup) -- that
 * trivial parse is replicated here verbatim-in-behavior so the REAL
 * estimator code runs over identical inputs.  The BAM constructor
 * aborts if reached.
 */
#ifndef CONTAMINATIONFINDER_SIMPLEPILEUP_H
#define CONTAMINATIONFINDER_SIMPLEPILEUP_H

#include <cstdlib>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

typedef struct {
    int min_mq, flag, min_baseQ, capQ_thres, max_depth;
} mplp_conf_t;

typedef std::vector<std::vector<char> > BaseInfo;
typedef std::vector<std::vector<char> > QualInfo;

class ContaminationEstimator;
class SVDcalculator;

struct region_t {
    std::string chr;
    int beg;  // 0 based
    int end;
    region_t(std::string chr0, int beg0, int end0)
        : chr(chr0), beg(beg0), end(end0) {}
    region_t() : chr(""), beg(0), end(0) {}
};

typedef std::unordered_map<
    std::string, std::unordered_map<int, std::pair<char, char> > > BED;

class SimplePileupViewer {
public:
    BED bedTable;
    BaseInfo baseInfo;
    QualInfo qualInfo;
    std::string SEQ_SM = "DefaultSampleName";
    int numBases = 0;
    int effectiveNumSite = 0;
    double avgDepth = 0;
    double sdDepth = 0;
    double firstQT = 0;
    double thirdQT = 0;
    std::unordered_map<std::string,
                       std::unordered_map<int, int> > posIndex;

    SimplePileupViewer() {}

    SimplePileupViewer(std::vector<region_t> *, const char *,
                       const char *, const char *, int = 1) {
        std::cerr << "stub SimplePileupViewer: BAM path unavailable\n";
        abort();
    }

    SimplePileupViewer(const BED &BedFromEstimator,
                       const std::string &pileupFile)
        : bedTable(BedFromEstimator) {
        ReadPileup(pileupFile);
    }

    int ReadPileup(const std::string &filePath) {
        int globalIndex = 0;
        std::string pChr, refAllele, seq, qual, line;
        int pPos, depth;
        std::ifstream fin(filePath);
        numBases = 0;
        if (!fin.is_open()) {
            std::cerr << "open file " << filePath << " failed!\n";
            exit(EXIT_FAILURE);
        }
        while (std::getline(fin, line)) {
            std::stringstream ss(line);
            ss >> pChr >> pPos >> refAllele >> depth >> seq >> qual;
            if (bedTable.find(pChr) == bedTable.end())
                continue;
            if (bedTable[pChr].find(pPos) == bedTable[pChr].end())
                continue;
            int tmpIndex = 0;
            bool existed = false;
            if (posIndex.find(pChr) != posIndex.end()
                && posIndex[pChr].find(pPos) != posIndex[pChr].end()) {
                tmpIndex = posIndex[pChr][pPos];
                existed = true;
            } else {
                posIndex[pChr][pPos] = globalIndex;
                globalIndex++;
            }
            std::vector<char> tmpBase, tmpQual;
            if (existed) {
                tmpBase = baseInfo[tmpIndex];
                tmpQual = qualInfo[tmpIndex];
            }
            std::copy(seq.begin(), seq.end(),
                      std::back_inserter(tmpBase));
            std::copy(qual.begin(), qual.end(),
                      std::back_inserter(tmpQual));
            /* faithful to the C: the merged copy of a duplicated line
             * is never written back (the "Merged here" warning drops
             * the merge), yet effectiveNumSite still increments */
            if (!existed) {
                baseInfo.push_back(tmpBase);
                qualInfo.push_back(tmpQual);
            }
            (void)tmpIndex;
            numBases += depth;
            effectiveNumSite++;
        }
        avgDepth = (double)numBases / GetNumMarker();
        return 0;
    }

    int GetNumMarker() { return effectiveNumSite; }

    inline std::vector<char> &GetBaseInfoAt(std::string &chr, int pos) {
        return baseInfo[posIndex[chr][pos]];
    }
    inline std::vector<char> &GetQualInfoAt(std::string &chr, int pos) {
        return qualInfo[posIndex[chr][pos]];
    }

    virtual ~SimplePileupViewer() {}
};

#endif
