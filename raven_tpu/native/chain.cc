// Anchor chaining: minimizer matches -> overlap coordinates (C++ core).
//
// Same algorithm as raven_tpu/overlap/chain.py (the ram-dependency
// replacement; see that file's docstring): diagonal-banded grouping by
// (target, strand), longest strictly-monotonic subsequence per group,
// gap-splitting, minimum anchor/span filters.  This is the host hot loop
// of the all-vs-all construct phase for large read sets.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

constexpr std::int64_t kDiagonalBand = 500;
constexpr std::int64_t kMinMatches = 4;
constexpr std::int64_t kMaxGap = 10000;
constexpr std::int64_t kMinSpan = 100;

// indices of one longest strictly-increasing subsequence (patience)
void lis_indices(const std::vector<std::int64_t>& v,
                 std::vector<std::int64_t>* out) {
  out->clear();
  const std::size_t n = v.size();
  if (n == 0) return;
  std::vector<std::int64_t> tails;       // smallest tail value per length
  std::vector<std::int64_t> tails_idx;   // its index
  std::vector<std::int64_t> prev(n, -1);
  tails.reserve(n);
  for (std::size_t i = 0; i < n; ++i) {
    const std::int64_t x = v[i];
    const std::size_t j =
        std::lower_bound(tails.begin(), tails.end(), x) - tails.begin();
    if (j == tails.size()) {
      tails.push_back(x);
      tails_idx.push_back(i);
    } else {
      tails[j] = x;
      tails_idx[j] = i;
    }
    prev[i] = j > 0 ? tails_idx[j - 1] : -1;
  }
  for (std::int64_t i = tails_idx.back(); i != -1; i = prev[i])
    out->push_back(i);
  std::reverse(out->begin(), out->end());
}

}  // namespace

extern "C" {

// Returns the number of overlaps written (<= cap), or -1 on overflow.
// When anchor buffers are non-null, each overlap's chain anchors (q, t)
// are appended to anchor_q/anchor_t with exclusive-end offsets in
// anchor_end[i]; anchors beyond anchor_cap spill -> returns -1.
long long raven_chain_anchors(
    const std::uint32_t* tid, const std::uint8_t* same,
    const std::int64_t* qpos, const std::int64_t* tpos, long long n,
    int kmer, std::uint32_t lhs_id, std::uint32_t* o_lhs_begin,
    std::uint32_t* o_lhs_end, std::uint32_t* o_rhs_id,
    std::uint32_t* o_rhs_begin, std::uint32_t* o_rhs_end,
    std::uint32_t* o_score, std::uint8_t* o_strand, long long cap,
    std::int64_t* anchor_q, std::int64_t* anchor_t, std::int64_t* anchor_end,
    long long anchor_cap) {
  if (n == 0) return 0;

  struct M {
    std::uint32_t tid;
    std::uint8_t same;
    std::int64_t diag;
    std::int64_t q;
    std::int64_t t;
  };
  std::vector<M> ms(n);
  for (long long i = 0; i < n; ++i) {
    const std::int64_t d = same[i] ? tpos[i] - qpos[i] : tpos[i] + qpos[i];
    ms[i] = M{tid[i], same[i], d, qpos[i], tpos[i]};
  }
  std::sort(ms.begin(), ms.end(), [](const M& a, const M& b) {
    if (a.tid != b.tid) return a.tid < b.tid;
    if (a.same != b.same) return a.same < b.same;
    return a.diag < b.diag;
  });

  long long written = 0;
  long long anchors_written = 0;
  std::vector<std::int64_t> vals, keep;
  std::vector<std::pair<std::int64_t, std::int64_t>> group;  // (q, t)

  long long gs = 0;
  for (long long i = 1; i <= n; ++i) {
    const bool boundary =
        i == n || ms[i].tid != ms[gs].tid || ms[i].same != ms[gs].same ||
        ms[i].diag - ms[i - 1].diag > kDiagonalBand;
    if (!boundary) continue;

    const long long ge = i;
    if (ge - gs >= kMinMatches) {
      const bool g_same = ms[gs].same != 0;
      group.clear();
      for (long long j = gs; j < ge; ++j) group.emplace_back(ms[j].q, ms[j].t);
      std::sort(group.begin(), group.end());

      vals.clear();
      for (const auto& p : group) vals.push_back(g_same ? p.second : -p.second);
      lis_indices(vals, &keep);

      if (static_cast<long long>(keep.size()) >= kMinMatches) {
        // split on large gaps
        std::size_t piece_start = 0;
        for (std::size_t j = 1; j <= keep.size(); ++j) {
          bool cut = j == keep.size();
          if (!cut) {
            const auto& a = group[keep[j - 1]];
            const auto& b = group[keep[j]];
            const std::int64_t gap = std::max(
                std::llabs(b.first - a.first), std::llabs(b.second - a.second));
            cut = gap > kMaxGap;
          }
          if (!cut) continue;
          const long long cnt = static_cast<long long>(j - piece_start);
          if (cnt >= kMinMatches) {
            std::int64_t lhs_b = group[keep[piece_start]].first;
            std::int64_t lhs_e = group[keep[j - 1]].first + kmer;
            std::int64_t t_lo = group[keep[piece_start]].second;
            std::int64_t t_hi = t_lo;
            for (std::size_t m = piece_start; m < j; ++m) {
              t_lo = std::min(t_lo, group[keep[m]].second);
              t_hi = std::max(t_hi, group[keep[m]].second);
            }
            t_hi += kmer;
            if (lhs_e - lhs_b >= kMinSpan && t_hi - t_lo >= kMinSpan) {
              if (written >= cap) return -1;
              if (anchor_q != nullptr) {
                if (anchors_written + cnt > anchor_cap) return -1;
                for (std::size_t m2 = piece_start; m2 < j; ++m2) {
                  anchor_q[anchors_written] = group[keep[m2]].first;
                  anchor_t[anchors_written] = group[keep[m2]].second;
                  ++anchors_written;
                }
                anchor_end[written] = anchors_written;
              }
              o_lhs_begin[written] = static_cast<std::uint32_t>(lhs_b);
              o_lhs_end[written] = static_cast<std::uint32_t>(lhs_e);
              o_rhs_id[written] = ms[gs].tid;
              o_rhs_begin[written] = static_cast<std::uint32_t>(t_lo);
              o_rhs_end[written] = static_cast<std::uint32_t>(t_hi);
              o_score[written] = static_cast<std::uint32_t>(cnt);
              o_strand[written] = g_same ? 1 : 0;
              ++written;
            }
          }
          piece_start = j;
        }
      }
    }
    gs = i;
  }
  (void)lhs_id;
  return written;
}

// Backwards-compatible entry without anchor outputs.
long long raven_chain(const std::uint32_t* tid, const std::uint8_t* same,
                      const std::int64_t* qpos, const std::int64_t* tpos,
                      long long n, int kmer, std::uint32_t lhs_id,
                      std::uint32_t* o_lhs_begin, std::uint32_t* o_lhs_end,
                      std::uint32_t* o_rhs_id, std::uint32_t* o_rhs_begin,
                      std::uint32_t* o_rhs_end, std::uint32_t* o_score,
                      std::uint8_t* o_strand, long long cap) {
  return raven_chain_anchors(tid, same, qpos, tpos, n, kmer, lhs_id,
                             o_lhs_begin, o_lhs_end, o_rhs_id, o_rhs_begin,
                             o_rhs_end, o_score, o_strand, cap, nullptr,
                             nullptr, nullptr, 0);
}

}  // extern "C"
