// Myers bit-parallel edit distance (block-based, Hyyro formulation).
//
// First-party replacement for the reference's edlib dependency use sites
// (global NW edit distance only: construct.cc:190-199, assemble.cc:271-281,
// graph_repr.cc:250-258, raven_test.cpp:38-44).  Pattern rows live in 64-bit
// blocks; vertical deltas are carried per block, horizontal deltas chain
// across blocks; the score tracks D[n][j] at the pattern's last row.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Block {
  std::uint64_t P;  // plus-vertical
  std::uint64_t M;  // minus-vertical
};

}  // namespace

extern "C" {

// a = pattern codes (0..3 or arbitrary bytes), b = text codes.
// Returns the global (NW) edit distance.
long long raven_myers_ed(const std::uint8_t* a, long long n,
                         const std::uint8_t* b, long long m) {
  if (n == 0) return m;
  if (m == 0) return n;

  const int W = 64;
  const long long nblocks = (n + W - 1) / W;
  std::vector<std::uint64_t> peq(256 * nblocks, 0);
  for (long long i = 0; i < n; ++i) {
    peq[a[i] * nblocks + i / W] |= 1ULL << (i % W);
  }

  std::vector<Block> blocks(nblocks);
  for (long long j = 0; j < nblocks; ++j) {
    blocks[j].P = ~0ULL;
    blocks[j].M = 0;
  }

  const int last_bit = static_cast<int>((n - 1) % W);
  long long score = n;

  for (long long j = 0; j < m; ++j) {
    const std::uint64_t* eq_row = &peq[b[j] * nblocks];
    int hin = 1;  // top boundary D[0][j] - D[0][j-1] = +1 (global alignment)
    for (long long bidx = 0; bidx < nblocks; ++bidx) {
      std::uint64_t Pv = blocks[bidx].P;
      std::uint64_t Mv = blocks[bidx].M;
      std::uint64_t Eq = eq_row[bidx];
      if (hin < 0) Eq |= 1ULL;
      const std::uint64_t Xv = Eq | Mv;
      const std::uint64_t Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq;
      std::uint64_t Ph = Mv | ~(Xh | Pv);
      std::uint64_t Mh = Pv & Xh;

      if (bidx == nblocks - 1) {
        // horizontal delta at the pattern's last row -> score
        score += (Ph >> last_bit) & 1ULL;
        score -= (Mh >> last_bit) & 1ULL;
      }

      int hout = 0;
      if (Ph >> 63) hout = 1;
      else if (Mh >> 63) hout = -1;

      Ph <<= 1;
      Mh <<= 1;
      if (hin < 0) Mh |= 1ULL;
      else if (hin > 0) Ph |= 1ULL;

      blocks[bidx].P = Mh | ~(Xv | Ph);
      blocks[bidx].M = Ph & Xv;
      hin = hout;
    }
  }
  return score;
}

}  // extern "C"
