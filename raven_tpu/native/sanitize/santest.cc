// Sanitizer test driver for the first-party native modules.
//
// The reference build force-enables AddressSanitizer on its library
// targets (RavenLib.cmake:13-23); this driver is the equivalent gate for
// our ctypes-loaded C++: misc/native_sanitize.sh compiles every .cc with
// -fsanitize=address,undefined and runs the exercises below.  Any heap
// overflow / UB aborts the binary, failing CI.
//
// Exercises: Myers edit distance (vs a plain DP oracle), anchor chaining
// (dense + adversarial orderings), boundary-crossing DP (threaded),
// POA consensus (weights / trim / degenerate shapes), FASTA/FASTQ
// parsing (plain + error paths).

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>

extern "C" {
long long raven_myers_ed(const std::uint8_t* a, long long n,
                         const std::uint8_t* b, long long m);
long long raven_myers_ed_banded(const std::uint8_t* a, long long n,
                                const std::uint8_t* b, long long m,
                                long long k);
long long raven_chain_anchors(
    const std::uint32_t* tid, const std::uint8_t* same,
    const std::int64_t* qpos, const std::int64_t* tpos, long long n,
    int kmer, std::uint32_t lhs_id, std::uint32_t* o_lhs_begin,
    std::uint32_t* o_lhs_end, std::uint32_t* o_rhs_id,
    std::uint32_t* o_rhs_begin, std::uint32_t* o_rhs_end,
    std::uint32_t* o_score, std::uint8_t* o_strand, long long cap,
    std::int64_t* anchor_q, std::int64_t* anchor_t, std::int64_t* anchor_end,
    long long anchor_cap);
void raven_boundary_crossings(const std::uint8_t* tgt,
                              const std::int64_t* t_off,
                              const std::int64_t* t_len,
                              const std::uint8_t* qry,
                              const std::int64_t* q_off,
                              const std::int64_t* q_len,
                              const std::int64_t* cross, long long n_jobs,
                              int n_threads, std::int64_t* out_j);
long long raven_poa_consensus(const std::uint8_t* backbone, long long blen,
                              const std::uint8_t* frags, const long long* offs,
                              const long long* flens,
                              const std::uint8_t* weights, long long nfrags,
                              int match, int mismatch, int gap, int trim,
                              std::uint8_t* out, long long out_cap);
void* raven_fastx_parse(const char* path, int is_fastq);
long long raven_fastx_num_reads(void* h);
long long raven_fastx_total_bases(void* h);
long long raven_fastx_names_size(void* h);
long long raven_fastx_has_quals(void* h);
const char* raven_fastx_error(void* h);
void raven_fastx_copy(void* h, std::uint8_t* codes, std::uint8_t* quals,
                      std::int64_t* lengths, char* names);
void raven_fastx_free(void* h);
}

static std::mt19937_64 rng(33);

static std::vector<std::uint8_t> rand_seq(size_t n) {
  std::vector<std::uint8_t> s(n);
  for (auto& c : s) c = rng() & 3;
  return s;
}

static long long dp_ed(const std::vector<std::uint8_t>& a,
                       const std::vector<std::uint8_t>& b) {
  std::vector<long long> row(b.size() + 1);
  for (size_t j = 0; j <= b.size(); ++j) row[j] = j;
  for (size_t i = 1; i <= a.size(); ++i) {
    long long diag = row[0];
    row[0] = i;
    for (size_t j = 1; j <= b.size(); ++j) {
      long long up = row[j], left = row[j - 1];
      long long best = diag + (a[i - 1] != b[j - 1]);
      if (up + 1 < best) best = up + 1;
      if (left + 1 < best) best = left + 1;
      diag = up;
      row[j] = best;
    }
  }
  return row[b.size()];
}

static void test_myers() {
  for (int t = 0; t < 50; ++t) {
    auto a = rand_seq(1 + rng() % 300);
    auto b = a;
    // mutate b
    for (size_t i = 0; i < b.size(); ++i)
      if (rng() % 10 == 0) b[i] = rng() & 3;
    long long got = raven_myers_ed(a.data(), a.size(), b.data(), b.size());
    long long want = dp_ed(a, b);
    assert(got == want);
  }
  // degenerate shapes
  std::uint8_t x = 1;
  assert(raven_myers_ed(&x, 0, &x, 1) == 1);
  assert(raven_myers_ed(&x, 1, &x, 0) == 1);
  assert(raven_myers_ed(&x, 0, &x, 0) == 0);
  std::puts("  myers ok");
}

static void test_myers_banded() {
  // Ukkonen contract: result <= k is the exact distance; -1 otherwise
  for (int t = 0; t < 60; ++t) {
    auto a = rand_seq(1 + rng() % 400);
    auto b = rand_seq(1 + rng() % 400);
    if (t % 2 == 0) {  // near-identical pair half the time
      b = a;
      for (size_t i = 0; i < b.size(); ++i)
        if (rng() % 12 == 0) b[i] = rng() & 3;
    }
    long long want = dp_ed(a, b);
    for (long long k : {1LL, 8LL, 64LL, 1024LL}) {
      long long got = raven_myers_ed_banded(
          a.data(), a.size(), b.data(), b.size(), k);
      if (want <= k) {
        assert(got == want);
      } else {
        assert(got == -1 || got == want);
      }
    }
  }
  std::uint8_t x = 1;
  assert(raven_myers_ed_banded(&x, 0, &x, 1, 4) == 1);
  assert(raven_myers_ed_banded(&x, 1, &x, 0, 0) == -1);
  assert(raven_myers_ed_banded(&x, 0, &x, 0, 0) == 0);
  std::puts("  myers banded ok");
}

static void test_chain() {
  for (int t = 0; t < 30; ++t) {
    long long n = 1 + rng() % 500;
    std::vector<std::uint32_t> tid(n);
    std::vector<std::uint8_t> same(n);
    std::vector<std::int64_t> qpos(n), tpos(n);
    for (long long i = 0; i < n; ++i) {
      tid[i] = 1 + rng() % 5;
      same[i] = rng() & 1;
      qpos[i] = rng() % 20000;
      tpos[i] = rng() % 20000;
    }
    long long cap = 64, acap = 4096;
    std::vector<std::uint32_t> lb(cap), le(cap), ri(cap), rb(cap), re(cap),
        sc(cap);
    std::vector<std::uint8_t> st(cap);
    std::vector<std::int64_t> aq(acap), at(acap), aend(cap);
    long long m = raven_chain_anchors(
        tid.data(), same.data(), qpos.data(), tpos.data(), n, 15, 0,
        lb.data(), le.data(), ri.data(), rb.data(), re.data(), sc.data(),
        st.data(), cap, aq.data(), at.data(), aend.data(), acap);
    assert(m >= -1 && m <= cap);
    // tiny caps must signal overflow (-1), never write out of bounds
    std::vector<std::uint32_t> lb1(1), le1(1), ri1(1), rb1(1), re1(1), sc1(1);
    std::vector<std::uint8_t> st1(1);
    std::vector<std::int64_t> aq1(1), at1(1), aend1(1);
    long long m1 = raven_chain_anchors(
        tid.data(), same.data(), qpos.data(), tpos.data(), n, 15, 0,
        lb1.data(), le1.data(), ri1.data(), rb1.data(), re1.data(),
        sc1.data(), st1.data(), 1, aq1.data(), at1.data(), aend1.data(), 1);
    assert(m1 >= -1 && m1 <= 1);
  }
  std::puts("  chain ok");
}

static void test_cross() {
  const long long n_jobs = 40;
  std::vector<std::uint8_t> tgt, qry;
  std::vector<std::int64_t> t_off(n_jobs), t_len(n_jobs), q_off(n_jobs),
      q_len(n_jobs), cross(n_jobs), out(n_jobs);
  for (long long j = 0; j < n_jobs; ++j) {
    long long tl = 1 + rng() % 200, ql = 1 + rng() % 200;
    t_off[j] = tgt.size();
    q_off[j] = qry.size();
    t_len[j] = tl;
    q_len[j] = ql;
    auto ts = rand_seq(tl), qs = rand_seq(ql);
    tgt.insert(tgt.end(), ts.begin(), ts.end());
    qry.insert(qry.end(), qs.begin(), qs.end());
    cross[j] = rng() % (tl + 1);
  }
  for (int threads : {1, 4}) {
    raven_boundary_crossings(tgt.data(), t_off.data(), t_len.data(),
                             qry.data(), q_off.data(), q_len.data(),
                             cross.data(), n_jobs, threads, out.data());
    for (long long j = 0; j < n_jobs; ++j)
      assert(out[j] >= 0 && out[j] <= q_len[j]);
  }
  std::puts("  cross ok");
}

static void test_poa() {
  for (int t = 0; t < 10; ++t) {
    auto truth = rand_seq(100 + rng() % 300);
    auto mutate = [&]() {
      std::vector<std::uint8_t> s;
      for (auto c : truth) {
        int r = rng() % 100;
        if (r < 5) continue;            // deletion
        if (r < 10) s.push_back(rng() & 3);  // insertion
        s.push_back(r < 15 ? (std::uint8_t)(rng() & 3) : c);
      }
      if (s.empty()) s.push_back(0);
      return s;
    };
    auto backbone = mutate();
    int nfrags = 3 + rng() % 12;
    std::vector<std::uint8_t> frags, weights;
    std::vector<long long> offs, flens;
    for (int f = 0; f < nfrags; ++f) {
      auto s = mutate();
      offs.push_back(frags.size());
      flens.push_back(s.size());
      frags.insert(frags.end(), s.begin(), s.end());
      for (size_t i = 0; i < s.size(); ++i)
        weights.push_back(1 + rng() % 60);
    }
    long long cap = backbone.size() * 2 + frags.size() + 64;
    std::vector<std::uint8_t> out(cap);
    for (int trim : {0, 1}) {
      long long n1 = raven_poa_consensus(
          backbone.data(), backbone.size(), frags.data(), offs.data(),
          flens.data(), weights.data(), nfrags, 3, -5, -4, trim, out.data(),
          cap);
      assert(n1 >= 0 && n1 <= cap);
      long long n2 = raven_poa_consensus(
          backbone.data(), backbone.size(), frags.data(), offs.data(),
          flens.data(), nullptr, nfrags, 3, -5, -4, trim, out.data(), cap);
      assert(n2 >= 0 && n2 <= cap);
    }
    // zero fragments + tiny output buffer
    long long n3 = raven_poa_consensus(backbone.data(), backbone.size(),
                                       frags.data(), offs.data(),
                                       flens.data(), nullptr, 0, 3, -5, -4, 1,
                                       out.data(), 1);
    assert(n3 >= -1);
  }
  std::puts("  poa ok");
}

static void test_fastx() {
  char dir[] = "/tmp/raven_santest_XXXXXX";
  assert(mkdtemp(dir) != nullptr);
  std::string fa = std::string(dir) + "/t.fasta";
  {
    FILE* f = fopen(fa.c_str(), "w");
    fprintf(f, ">read1 desc\nACGTACGTNN\nACGT\n>read2\nGGGGCCCC\n");
    fclose(f);
  }
  void* h = raven_fastx_parse(fa.c_str(), 0);
  assert(h != nullptr);
  assert(std::strlen(raven_fastx_error(h)) == 0);
  assert(raven_fastx_num_reads(h) == 2);
  long long bases = raven_fastx_total_bases(h);
  std::vector<std::uint8_t> codes(bases);
  std::vector<std::int64_t> lens(2);
  std::vector<char> names(raven_fastx_names_size(h));
  raven_fastx_copy(h, codes.data(), nullptr, lens.data(), names.data());
  assert(lens[0] + lens[1] == bases);
  raven_fastx_free(h);

  std::string fq = std::string(dir) + "/t.fastq";
  {
    FILE* f = fopen(fq.c_str(), "w");
    fprintf(f, "@r1\nACGT\n+\n!!!!\n@r2\nGGTT\n+\nIIII\n");
    fclose(f);
  }
  h = raven_fastx_parse(fq.c_str(), 1);
  assert(h != nullptr && std::strlen(raven_fastx_error(h)) == 0);
  assert(raven_fastx_num_reads(h) == 2 && raven_fastx_has_quals(h) == 1);
  raven_fastx_free(h);

  // error path: missing file must report, not crash
  h = raven_fastx_parse("/nonexistent/x.fasta", 0);
  if (h != nullptr) {
    assert(std::strlen(raven_fastx_error(h)) > 0 ||
           raven_fastx_num_reads(h) == 0);
    raven_fastx_free(h);
  }
  std::puts("  fastx ok");
}

int main() {
  test_myers();
  test_myers_banded();
  test_chain();
  test_cross();
  test_poa();
  test_fastx();
  std::puts("native sanitizer exercises passed");
  return 0;
}
