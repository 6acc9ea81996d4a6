// Irreducible-block extraction engine (native runtime component).
//
// Replicates the semantics of the reference IrreducibleBlockListExtractor
// (/root/reference/src/overlap_builder.cpp:706-836) — lockstep right-extension
// of overlap-block groups with '$'-terminal emission, unique-extension
// continuation, and branch splitting — over MANY per-read tasks, each
// processed to completion, OpenMP-parallel across tasks.
//
// occ(c, i) runs as a binary search over per-symbol sorted position lists of
// the BWT (the same answers as the FM-index occ tables).  Each block round
// computes one occ pair reused for both ext() and updateR, like the batched
// Python extractor.
//
// Block record layout (int64 x 10):
//   [0..3] capped pair: lo, hi, rlo, rhi
//   [4..7] raw pair (immutable)
//   [8]    overlap length
//   [9]    align flags (bit0 query-rev, bit1 target-rev, bit2 query-comp)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int QUERYCOMP_BIT = 2;
constexpr int TARGETREV_BIT = 1;
constexpr int REC = 10;

struct Index {
  const int64_t* pos[5];
  int64_t len[5];
  const int64_t* pred;
};

// count of symbol c at positions <= i  (occ(c, -1) == 0)
static inline int64_t occ(const Index& ix, int c, int64_t i) {
  const int64_t* a = ix.pos[c];
  int64_t lo = 0, hi = ix.len[c];
  const int64_t key = i + 1;  // count of p < key
  while (lo < hi) {
    int64_t mid = (lo + hi) >> 1;
    if (a[mid] < key) lo = mid + 1; else hi = mid;
  }
  return lo;
}

struct Block {
  int64_t v[REC];
  int64_t l[5], u[5];  // cached occ counts at (rlo-1, rhi) for this round
  bool tr, qc;
};

static inline void fill_counts(Block& b, const Index& fwd, const Index& rev) {
  const Index& ix = b.tr ? fwd : rev;
  for (int c = 0; c < 5; ++c) {
    b.l[c] = occ(ix, c, b.v[2] - 1);
    b.u[c] = occ(ix, c, b.v[3]);
  }
}

static inline void ext_counts(const Block& b, int64_t* e) {
  int64_t d[5];
  for (int c = 0; c < 5; ++c) d[c] = b.u[c] - b.l[c];
  if (b.qc) {
    e[0] = d[0]; e[1] = d[4]; e[2] = d[3]; e[3] = d[2]; e[4] = d[1];
  } else {
    for (int c = 0; c < 5; ++c) e[c] = d[c];
  }
}

static const int COMP[5] = {0, 4, 3, 2, 1};

// capped.updateR(c) from cached counts; returns validity
static inline bool update_right(Block& b, int c_rank, const Index& fwd,
                                const Index& rev) {
  int cr = b.qc ? COMP[c_rank] : c_rank;
  const Index& ix = b.tr ? fwd : rev;
  int64_t below = 0;
  for (int c = 0; c < cr; ++c) below += b.u[c] - b.l[c];
  int64_t dc = b.u[cr] - b.l[cr];
  int64_t nlo = b.v[0] + below;
  int64_t nhi = nlo + dc - 1;
  b.v[0] = nlo;
  b.v[1] = nhi;
  b.v[2] = ix.pred[cr] + b.l[cr];
  b.v[3] = ix.pred[cr] + b.u[cr] - 1;
  return nhi >= nlo && nhi >= 0 && b.v[3] >= b.v[2] && b.v[3] >= 0;
}

// One task: extract irreducible blocks; returns false on substring failure.
static bool run_task(const int64_t* in_blocks, int64_t n_in, const Index& fwd,
                     const Index& rev, std::vector<int64_t>* out) {
  std::vector<Block> init(n_in);
  for (int64_t i = 0; i < n_in; ++i) {
    std::memcpy(init[i].v, in_blocks + i * REC, sizeof(init[i].v));
    init[i].tr = (init[i].v[9] >> TARGETREV_BIT) & 1;
    init[i].qc = (init[i].v[9] >> QUERYCOMP_BIT) & 1;
  }
  // stable sort by descending length
  std::stable_sort(init.begin(), init.end(),
                   [](const Block& a, const Block& b) { return a.v[8] > b.v[8]; });

  std::vector<std::vector<Block>> groups;
  groups.push_back(std::move(init));

  while (!groups.empty()) {
    // refresh occ counts for every live block
    for (auto& g : groups)
      for (auto& b : g) fill_counts(b, fwd, rev);

    std::vector<std::vector<Block>> incomings;
    size_t gi = 0;
    while (gi < groups.size()) {
      std::vector<Block>& blocklist = groups[gi];
      bool erase_group = true;
      if (!blocklist.empty()) {
        int64_t top_length = blocklist[0].v[8];
        int64_t exts[5] = {0, 0, 0, 0, 0};
        for (const auto& b : blocklist) {
          if (b.v[8] != top_length) break;
          int64_t e[5];
          ext_counts(b, e);
          for (int c = 0; c < 5; ++c) exts[c] += e[c];
        }
        if (exts[0] > 0) {
          for (const auto& b : blocklist) {
            if (b.v[8] != top_length) break;
            int64_t e[5];
            ext_counts(b, e);
            if (e[0] == 0) return false;  // substring read: run rmdup first
            Block branched = b;
            update_right(branched, 0, fwd, rev);
            out->insert(out->end(), branched.v, branched.v + REC);
          }
        } else {
          for (const auto& b : blocklist) {
            if (b.v[8] < top_length) {
              int64_t e[5];
              ext_counts(b, e);
              for (int c = 0; c < 5; ++c) exts[c] += e[c];
            }
          }
          int nonzero = 0, only = -1;
          for (int c = 0; c < 5; ++c)
            if (exts[c] > 0) { ++nonzero; only = c; }
          if (nonzero == 1) {
            std::vector<Block> keep;
            keep.reserve(blocklist.size());
            for (auto& b : blocklist)
              if (update_right(b, only, fwd, rev)) keep.push_back(b);
            blocklist.swap(keep);
            erase_group = false;
          } else {
            for (int c = 0; c < 5; ++c) {
              if (exts[c] <= 0) continue;
              std::vector<Block> branched;
              branched.reserve(blocklist.size());
              for (const auto& b : blocklist) {
                Block nb = b;
                if (update_right(nb, c, fwd, rev)) branched.push_back(nb);
              }
              incomings.push_back(std::move(branched));
            }
          }
        }
      }
      if (erase_group) {
        groups.erase(groups.begin() + gi);
        gi += 1;  // reference loop skips the group after an erase
      } else {
        gi += 2;  // reference loop double-advances
      }
    }
    for (auto& g : incomings) groups.push_back(std::move(g));
  }
  return true;
}

}  // namespace

extern "C" {

// Returns total emitted int64s (n_blocks*10), or -1 if out_cap insufficient.
int64_t siga_extract_irreducible(
    int64_t n_tasks, const int64_t* task_offsets,  // [n_tasks+1]
    const int64_t* blocks,                         // [task_offsets[n_tasks]*10]
    const int64_t* fwd_pos, const int64_t* fwd_off, const int64_t* fwd_pred,
    const int64_t* rev_pos, const int64_t* rev_off, const int64_t* rev_pred,
    int64_t out_cap,                               // capacity in int64s
    int64_t* out_blocks,                           // [out_cap]
    int64_t* out_counts,                           // [n_tasks] blocks emitted
    uint8_t* out_failed,                           // [n_tasks]
    int64_t n_threads) {
  Index fwd, rev;
  for (int c = 0; c < 5; ++c) {
    fwd.pos[c] = fwd_pos + fwd_off[c];
    fwd.len[c] = fwd_off[c + 1] - fwd_off[c];
    rev.pos[c] = rev_pos + rev_off[c];
    rev.len[c] = rev_off[c + 1] - rev_off[c];
  }
  fwd.pred = fwd_pred;
  rev.pred = rev_pred;

  std::vector<std::vector<int64_t>> outs(n_tasks);
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads((int)n_threads);
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t t = 0; t < n_tasks; ++t) {
    const int64_t* in = blocks + task_offsets[t] * REC;
    int64_t n_in = task_offsets[t + 1] - task_offsets[t];
    bool ok = run_task(in, n_in, fwd, rev, &outs[t]);
    out_failed[t] = ok ? 0 : 1;
    out_counts[t] = (int64_t)(outs[t].size() / REC);
  }

  int64_t total = 0;
  for (int64_t t = 0; t < n_tasks; ++t) total += (int64_t)outs[t].size();
  if (total > out_cap) return -1;
  int64_t off = 0;
  for (int64_t t = 0; t < n_tasks; ++t) {
    std::memcpy(out_blocks + off, outs[t].data(), outs[t].size() * sizeof(int64_t));
    off += (int64_t)outs[t].size();
  }
  return total;
}

}  // extern "C"
