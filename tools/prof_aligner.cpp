// Standalone profiling harness for native/aligner.cpp.
// Loads the world dumped by tools/dump_bench_world.py and runs the batch
// single-threaded with per-phase timers (width calc vs search).
//
// Build:
//   g++ -O3 -march=native -DFQ_PROF_MAIN -o /tmp/prof_aligner \
//       tools/prof_aligner.cpp
// Run:
//   /tmp/prof_aligner /tmp/fq_bench_world.bin [reps]

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#define main aligner_main_unused
#include "../fastquick_tpu/native/aligner.cpp"
#undef main

namespace {

struct World {
  std::vector<uint32_t> words[2];
  std::vector<int32_t> occ[2], sa[2];
  int32_t L2[2][4], primary[2];
  int64_t n;
  int32_t B, L;
  std::vector<uint8_t> seqs;
  std::vector<int32_t> lens, mds;
};

template <typename T>
void read_vec(FILE *f, std::vector<T> &v) {
  int64_t sz;
  if (fread(&sz, 8, 1, f) != 1) abort();
  v.resize(sz);
  if (sz && fread(v.data(), sizeof(T), sz, f) != (size_t)sz) abort();
}

World load(const char *path) {
  World w;
  FILE *f = fopen(path, "rb");
  if (!f) { perror(path); exit(1); }
  if (fread(&w.n, 8, 1, f) != 1) abort();
  for (int d = 0; d < 2; ++d) {
    if (fread(&w.primary[d], 4, 1, f) != 1) abort();
    if (fread(w.L2[d], 4, 4, f) != 4) abort();
    read_vec(f, w.words[d]);
    read_vec(f, w.occ[d]);
    read_vec(f, w.sa[d]);
  }
  if (fread(&w.B, 4, 1, f) != 1 || fread(&w.L, 4, 1, f) != 1) abort();
  w.seqs.resize((size_t)w.B * 2 * w.L);
  w.lens.resize(w.B);
  w.mds.resize(w.B);
  if (fread(w.seqs.data(), 1, w.seqs.size(), f) != w.seqs.size()) abort();
  if (fread(w.lens.data(), 4, w.B, f) != (size_t)w.B) abort();
  if (fread(w.mds.data(), 4, w.B, f) != (size_t)w.B) abort();
  fclose(f);
  return w;
}

double now() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

}  // namespace

#undef main
int main(int argc, char **argv) {
  const char *path = argc > 1 ? argv[1] : "/tmp/fq_bench_world.bin";
  int reps = argc > 2 ? atoi(argv[2]) : 1;
  int use_threads = argc > 3 ? atoi(argv[3]) : 0;
  World w = load(path);
  fprintf(stderr, "loaded n=%lld B=%d L=%d\n", (long long)w.n, w.B, w.L);

  Index *idx = (Index *)aln_create(
      w.words[0].data(), w.occ[0].data(), w.sa[0].data(), w.L2[0],
      w.primary[0], w.words[1].data(), w.occ[1].data(), w.sa[1].data(),
      w.L2[1], w.primary[1], w.n);

  // mirrors aln_batch's Opt setup with GapOpt defaults
  int md_max = 0;
  for (int b = 0; b < w.B; ++b)
    if (w.mds[b] > md_max) md_max = w.mds[b];
  int batch_md = md_max;  // engine.py: maxdiff at L
  int max_gapo = 1 < batch_md ? 1 : batch_md;
  Opt opt{3, 11, 4, 0, max_gapo, 6, 5, 10, 2000000, 30, 32, 2, 1};
  const int OUT_CAP = 256;
  std::vector<int32_t> out_n(w.B);
  std::vector<int32_t> out((size_t)w.B * OUT_CAP * 7);

  auto result_hash = [&]() {
    // FNV-1a over (out_n, hit rows) so engine changes can prove identity
    uint64_t h = 1469598103934665603ull;
    auto mix = [&h](int32_t v) {
      h ^= (uint32_t)v;
      h *= 1099511628211ull;
    };
    for (int b = 0; b < w.B; ++b) {
      mix(out_n[b]);
      int nn = out_n[b] < 0 ? OUT_CAP : out_n[b];
      for (int j = 0; j < nn * 7; ++j) mix(out[(size_t)b * OUT_CAP * 7 + j]);
    }
    return h;
  };

  if (use_threads == 1) {  // measure the production threaded entry point
    double t0 = now();
    for (int rep = 0; rep < reps; ++rep)
      aln_batch(idx, w.seqs.data(), w.lens.data(), w.mds.data(), w.B, w.L, 3,
                11, 4, max_gapo, 6, 5, 10, 2000000, 30, 32, 2, out_n.data(),
                out.data(), OUT_CAP);
    double dt = now() - t0;
    long long nh = 0;
    for (int b = 0; b < w.B; ++b) nh += out_n[b] > 0;
    fprintf(stderr, "result hash: %016llx\n",
            (unsigned long long)result_hash());
    fprintf(stderr, "threaded: reps=%d reads=%d hits=%lld %.3fs  %.0f reads/s\n",
            reps, w.B, nh, dt, (double)w.B * reps / dt);
    aln_destroy(idx);
    return 0;
  }

  if (use_threads == 2) {  // single-thread production path (group widths)
    double t0 = now();
    for (int rep = 0; rep < reps; ++rep)
      aln_batch_range(idx, w.seqs.data(), w.lens.data(), w.mds.data(), 0,
                      w.B, w.L, opt, opt.seed_len, out_n.data(), out.data(),
                      OUT_CAP);
    double dt = now() - t0;
    long long nh = 0;
    for (int b = 0; b < w.B; ++b) nh += out_n[b] > 0;
    fprintf(stderr, "result hash: %016llx\n",
            (unsigned long long)result_hash());
    fprintf(stderr,
            "range: reps=%d reads=%d hits=%lld %.3fs  %.0f reads/s/core\n",
            reps, w.B, nh, dt, (double)w.B * reps / dt);
    aln_destroy(idx);
    return 0;
  }

  Stack stack;
  stack.init(aln_score(opt, md_max + 1, opt.max_gapo + 1, opt.max_gape + 1) +
             1);
  std::vector<Width> w0(w.L + 1), w1(w.L + 1), sw0(opt.seed_len + 1),
      sw1(opt.seed_len + 1);

  double t_width = 0, t_search = 0;
  long long n_hits = 0;
  for (int rep = 0; rep < reps; ++rep) {
    for (int b = 0; b < w.B; ++b) {
      int len = w.lens[b];
      const uint8_t *s0 = w.seqs.data() + (size_t)b * 2 * w.L;
      const uint8_t *s1 = s0 + w.L;
      const uint8_t *ss[2] = {s0, s1};
      Opt o = opt;
      o.max_diff = w.mds[b];
      o.seed_len = opt.seed_len < len ? opt.seed_len : 0x7FFFFFFF;
      double t0 = now();
      cal_width2(idx->dir[0], idx->dir[1], idx->n, len, s0, s1, w0.data(),
                 w1.data());
      bool use_seed = len > opt.seed_len;
      if (use_seed) {
        cal_width2(idx->dir[0], idx->dir[1], idx->n, opt.seed_len,
                   s0 + (len - opt.seed_len), s1 + (len - opt.seed_len),
                   sw0.data(), sw1.data());
      }
      double t1 = now();
      Width *ws[2] = {w0.data(), w1.data()};
      Width *sws[2] = {sw0.data(), sw1.data()};
      int nal = match_gap(*idx, len, ss, ws, sws, use_seed, o, stack,
                          out.data() + (size_t)b * OUT_CAP * 7, OUT_CAP);
      double t2 = now();
      t_width += t1 - t0;
      t_search += t2 - t1;
      out_n[b] = nal;
      if (nal > 0) ++n_hits;
    }
  }
  // FNV-1a over (out_n, hit rows) so engine changes can prove identity
  uint64_t h = 1469598103934665603ull;
  auto mix = [&h](int32_t v) {
    h ^= (uint32_t)v;
    h *= 1099511628211ull;
  };
  for (int b = 0; b < w.B; ++b) {
    mix(out_n[b]);
    int nn = out_n[b] < 0 ? OUT_CAP : out_n[b];
    for (int j = 0; j < nn * 7; ++j) mix(out[(size_t)b * OUT_CAP * 7 + j]);
  }
  fprintf(stderr, "result hash: %016llx\n", (unsigned long long)h);
#ifdef FQ_PROF_COUNTERS
  fprintf(stderr,
          "counters: pops=%lld (post-hit %.1f%%) pushes=%lld (dead %.1f%%) "
          "occ=%lld (dead %.1f%%) exact_alt_steps=%lld\n",
          g_prof.pops, 100.0 * g_prof.pops_posthit / g_prof.pops,
          g_prof.pushes, 100.0 * g_prof.pushes_dead / g_prof.pushes,
          g_prof.occ_calls, 100.0 * g_prof.occ_dead / g_prof.occ_calls,
          g_prof.exact_alt_steps);
#endif
  double total = t_width + t_search;
  fprintf(stderr,
          "reps=%d reads=%d hits=%lld  width=%.3fs (%.1f%%)  "
          "search=%.3fs (%.1f%%)  total=%.3fs  %.0f reads/s/core\n",
          reps, w.B, n_hits, t_width, 100 * t_width / total, t_search,
          100 * t_search / total, total, (double)w.B * reps / total);
  aln_destroy(idx);
  return 0;
}
