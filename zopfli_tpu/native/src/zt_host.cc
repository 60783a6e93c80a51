// zt_host.cc — native host engine for the tpu-zopfli framework.
//
// This is the CPU-side runtime used for (a) the correctness oracle in
// tests, (b) a fast host fallback when no TPU is attached, and (c) the
// host finishing stages (checksums) of the distributed pipeline.  The
// TPU compute path (JAX/Pallas kernels) lives in zopfli_tpu/ops/.
//
// Algorithm semantics follow the reference encoder so that output sizes
// are reproducible (reference: src/zopfli/hash.c, lz77.c, squeeze.c), but
// the design is our own: planar arrays, a per-block candidate table that
// memoizes the full min-distance-per-length step function (subsuming the
// reference's 8-slot longest-match cache losslessly), and a C ABI meant
// for ctypes + numpy buffers.
//
// Build: see ../build.sh (g++ -O2 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace zt {

constexpr int kMinMatch = 3;
constexpr int kMaxMatch = 258;
constexpr int kWindowSize = 32768;
constexpr int kWindowMask = kWindowSize - 1;
constexpr int kMaxChainHits = 8192;
constexpr double kLargeFloat = 1e30;

// ---------------------------------------------------------------------------
// DEFLATE symbol helpers (RFC 1951 3.2.5).
// ---------------------------------------------------------------------------

static inline int LengthSymbol(int l) {
  // 257..285 for l in 3..258.
  static int table[259];
  static bool init = false;
  if (!init) {
    int sym = 257, base = 3;
    const int ebits[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
                           3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
    for (int s = 0; s < 28; ++s) {
      int span = 1 << ebits[s];
      for (int i = 0; i < span && base + i <= 258; ++i) table[base + i] = sym;
      base += span;
      ++sym;
    }
    table[258] = 285;
    init = true;
  }
  return table[l];
}

static inline int LengthExtraBits(int l) {
  if (l < 11 || l == 258) return 0;
  if (l < 19) return 1;
  if (l < 35) return 2;
  if (l < 67) return 3;
  if (l < 131) return 4;
  return 5;
}

static inline int DistSymbol(int dist) {
  if (dist < 5) return dist - 1;
  int d1 = dist - 1;
  int lg = 31 - __builtin_clz(d1);
  int r = (d1 >> (lg - 1)) & 1;
  return lg * 2 + r;
}

static inline int DistExtraBits(int dist) {
  if (dist < 5) return 0;
  return (31 - __builtin_clz(dist - 1)) - 1;
}

// ---------------------------------------------------------------------------
// Rolling-hash chain index over the 32 KiB window.
// ---------------------------------------------------------------------------

struct ChainIndex {
  // Primary hash: 15-bit rolling hash of 3 bytes.
  std::vector<int32_t> head;       // hash value -> most recent window slot
  std::vector<uint16_t> prev;      // window slot -> previous slot, same hash
  std::vector<int32_t> slot_hash;  // window slot -> hash value stored there
  // Run-length tracker: identical-byte run ending at each slot.
  std::vector<uint16_t> run;
  // Secondary hash keyed on (run length, first byte) for long runs.
  std::vector<int32_t> head2;
  std::vector<uint16_t> prev2;
  std::vector<int32_t> slot_hash2;
  int val = 0;
  int val2 = 0;

  ChainIndex()
      : head(65536, -1), prev(kWindowSize), slot_hash(kWindowSize, -1),
        run(kWindowSize, 0), head2(65536, -1), prev2(kWindowSize),
        slot_hash2(kWindowSize, -1) {
    for (int i = 0; i < kWindowSize; ++i) prev[i] = prev2[i] = (uint16_t)i;
  }

  void Reset() {
    val = val2 = 0;
    std::fill(head.begin(), head.end(), -1);
    std::fill(head2.begin(), head2.end(), -1);
    std::fill(slot_hash.begin(), slot_hash.end(), -1);
    std::fill(slot_hash2.begin(), slot_hash2.end(), -1);
    std::fill(run.begin(), run.end(), 0);
    for (int i = 0; i < kWindowSize; ++i) prev[i] = prev2[i] = (uint16_t)i;
  }

  inline void Mix(uint8_t c) { val = ((val << 5) ^ c) & 0x7fff; }

  // Seed the rolling hash with the first bytes of the window prefix.
  void Warmup(const uint8_t* data, int64_t pos, int64_t end) {
    Mix(data[pos]);
    if (pos + 1 < end) Mix(data[pos + 1]);
  }

  // Insert position `pos`; must be called for consecutive positions.
  void Insert(const uint8_t* data, int64_t pos, int64_t end) {
    int slot = (int)(pos & kWindowMask);
    Mix(pos + kMinMatch <= end ? data[pos + kMinMatch - 1] : 0);
    slot_hash[slot] = val;
    if (head[val] != -1 && slot_hash[head[val]] == val)
      prev[slot] = (uint16_t)head[val];
    else
      prev[slot] = (uint16_t)slot;
    head[val] = slot;

    // Identical-byte run length ending here.
    uint16_t amount = 0;
    uint16_t prev_run = run[(pos - 1) & kWindowMask];
    if (prev_run > 1) amount = prev_run - 1;
    while (pos + amount + 1 < end && data[pos] == data[pos + amount + 1] &&
           amount < (uint16_t)(-1))
      ++amount;
    run[slot] = amount;

    val2 = ((amount - kMinMatch) & 255) ^ val;
    slot_hash2[slot] = val2;
    if (head2[val2] != -1 && slot_hash2[head2[val2]] == val2)
      prev2[slot] = (uint16_t)head2[val2];
    else
      prev2[slot] = (uint16_t)slot;
    head2[val2] = slot;
  }
};

// Common-prefix length of data[a..] and data[b..], capped at `limit`.
static inline int64_t MatchLen(const uint8_t* data, int64_t a, int64_t b,
                               int64_t limit) {
  int64_t i = 0;
  while (i + 8 <= limit) {
    uint64_t x, y;
    std::memcpy(&x, data + a + i, 8);
    std::memcpy(&y, data + b + i, 8);
    if (x != y) {
      uint64_t diff = x ^ y;
      return i + (__builtin_ctzll(diff) >> 3);
    }
    i += 8;
  }
  while (i < limit && data[a + i] == data[b + i]) ++i;
  return i;
}

// One (max-length, distance) breakpoint of the min-distance step function.
struct Breakpoint {
  uint16_t len;
  uint16_t dist;
};

// Longest-match search over the hash chain.  If `sublen` is non-null it
// receives, for every l in [3, returned length], the smallest distance
// achieving a match of at least l (the reference "sublen" contract,
// lz77.c:407-542).
static void FindMatch(const ChainIndex& ix, const uint8_t* data, int64_t pos,
                      int64_t size, int64_t limit, uint16_t* sublen,
                      uint16_t* out_dist, uint16_t* out_len) {
  int hpos = (int)(pos & kWindowMask);
  uint16_t bestdist = 0;
  uint16_t bestlength = 1;
  int chain_budget = kMaxChainHits;

  if (size - pos < kMinMatch) {
    *out_len = 0;
    *out_dist = 0;
    return;
  }
  if (pos + limit > size) limit = size - pos;

  const int32_t* chain_head = ix.head.data();
  const uint16_t* chain_prev = ix.prev.data();
  const int32_t* chain_hash = ix.slot_hash.data();
  int hval = ix.val;

  int pp = chain_head[hval];  // == hpos (inserted just before this call)
  int p = chain_prev[pp];
  uint32_t dist = p < pp ? (uint32_t)(pp - p) : (uint32_t)(kWindowSize - p + pp);

  while (dist < (uint32_t)kWindowSize) {
    if (dist > 0 && (int64_t)dist <= pos) {
      int64_t cur = 0;
      int64_t scan = pos, match = pos - dist;
      if (pos + bestlength >= size ||
          data[scan + bestlength] == data[match + bestlength]) {
        // Skip the shared identical-byte run prefix in one step.
        uint16_t run0 = ix.run[pos & kWindowMask];
        if (run0 > 2 && data[scan] == data[match]) {
          uint16_t run1 = ix.run[(pos - dist) & kWindowMask];
          int64_t same = run0 < run1 ? run0 : run1;
          if (same > limit) same = limit;
          scan += same;
          match += same;
          cur = same;
        }
        cur += MatchLen(data, scan, match, limit - cur);
      }
      if (cur > bestlength) {
        if (sublen) {
          for (int64_t j = bestlength + 1; j <= cur; ++j)
            sublen[j] = (uint16_t)dist;
        }
        bestdist = (uint16_t)dist;
        bestlength = (uint16_t)cur;
        if (cur >= limit) break;
      }
    }

    // Switch to the run-keyed secondary chain once it prunes better.
    if (chain_head != ix.head2.data() && bestlength >= ix.run[hpos] &&
        ix.val2 == ix.slot_hash2[p]) {
      chain_head = ix.head2.data();
      chain_prev = ix.prev2.data();
      chain_hash = ix.slot_hash2.data();
      hval = ix.val2;
    }
    (void)chain_hash;

    pp = p;
    p = chain_prev[p];
    if (p == pp) break;  // end of chain
    dist += p < pp ? (uint32_t)(pp - p) : (uint32_t)(kWindowSize - p + pp);
    if (--chain_budget <= 0) break;
  }

  *out_dist = bestdist;
  *out_len = bestlength;
}

// ---------------------------------------------------------------------------
// Greedy parse with one-step lazy matching (reference lz77.c:544-630).
// ---------------------------------------------------------------------------

static inline int LengthScore(int length, int distance) {
  // Long distances burn extra bits; demote them slightly (lz77.c:265-271).
  return distance > 1024 ? length - 1 : length;
}

static int64_t GreedyParse(const uint8_t* data, int64_t instart, int64_t inend,
                           uint16_t* out_litlens, uint16_t* out_dists) {
  if (instart == inend) return 0;
  ChainIndex ix;
  int64_t windowstart = instart > kWindowSize ? instart - kWindowSize : 0;
  ix.Warmup(data, windowstart, inend);
  for (int64_t i = windowstart; i < instart; ++i) ix.Insert(data, i, inend);

  uint16_t sublen[kMaxMatch + 1];
  int64_t n = 0;
  uint32_t prev_length = 0, prev_match = 0;
  bool match_available = false;

  for (int64_t i = instart; i < inend; ++i) {
    ix.Insert(data, i, inend);
    uint16_t leng, dist;
    FindMatch(ix, data, i, inend, kMaxMatch, sublen, &dist, &leng);
    int lengthscore = LengthScore(leng, dist);

    // One-step lazy matching.
    int prevlengthscore = LengthScore((int)prev_length, (int)prev_match);
    if (match_available) {
      match_available = false;
      if (lengthscore > prevlengthscore + 1) {
        out_litlens[n] = data[i - 1];
        out_dists[n] = 0;
        ++n;
        if (lengthscore >= kMinMatch && leng < kMaxMatch) {
          match_available = true;
          prev_length = leng;
          prev_match = dist;
          continue;
        }
      } else {
        // Emit the previous match instead.
        leng = (uint16_t)prev_length;
        dist = (uint16_t)prev_match;
        out_litlens[n] = leng;
        out_dists[n] = dist;
        ++n;
        for (int64_t j = 2; j < leng; ++j) {
          ++i;
          ix.Insert(data, i, inend);
        }
        continue;
      }
    } else if (lengthscore >= kMinMatch && leng < kMaxMatch) {
      match_available = true;
      prev_length = leng;
      prev_match = dist;
      continue;
    }

    if (lengthscore >= kMinMatch) {
      out_litlens[n] = leng;
      out_dists[n] = dist;
      ++n;
    } else {
      leng = 1;
      out_litlens[n] = data[i];
      out_dists[n] = 0;
      ++n;
    }
    for (int64_t j = 1; j < leng; ++j) {
      ++i;
      ix.Insert(data, i, inend);
    }
  }
  return n;
}

// ---------------------------------------------------------------------------
// Per-block squeeze engine with a memoized candidate table.
// ---------------------------------------------------------------------------

struct BlockEngine {
  const uint8_t* data;
  int64_t instart, inend;

  // Memoized candidates, one entry per block offset: the full
  // min-distance-per-length step function as (len, dist) breakpoints.
  // bp_start[j] == -1 marks "not yet computed".  best_len/best_dist cache
  // the unrestricted search result.  This subsumes the reference's
  // fixed-depth longest-match cache (cache.c) without its re-search path.
  std::vector<int64_t> bp_start;
  std::vector<int32_t> bp_count;
  std::vector<uint16_t> best_len;
  std::vector<uint16_t> best_dist;
  std::vector<Breakpoint> arena;

  // Scratch for DP runs.
  std::vector<float> costs;
  std::vector<uint16_t> len_arr;
  std::vector<uint16_t> dist_arr;

  BlockEngine(const uint8_t* d, int64_t s, int64_t e)
      : data(d), instart(s), inend(e) {
    int64_t bs = e - s;
    bp_start.assign(bs, -1);
    bp_count.assign(bs, 0);
    best_len.assign(bs, 0);
    best_dist.assign(bs, 0);
    costs.resize(bs + 1);
    len_arr.resize(bs + 1);
    dist_arr.resize(bs + 1);
  }

  // Fetch (and memoize) the candidate set for block offset j.  Expands the
  // breakpoint list into sublen[0..258]; returns the best length.
  uint16_t Candidates(ChainIndex& ix, int64_t j, uint16_t* sublen,
                      uint16_t* dist) {
    if (bp_start[j] < 0) {
      uint16_t d, l;
      uint16_t sl[kMaxMatch + 1];
      FindMatch(ix, data, instart + j, inend, kMaxMatch, sl, &d, &l);
      bp_start[j] = (int64_t)arena.size();
      best_len[j] = l;
      best_dist[j] = d;
      int cnt = 0;
      for (int k = kMinMatch; k <= l; ++k) {
        if (k == l || sl[k] != sl[k + 1]) {
          arena.push_back({(uint16_t)k, sl[k]});
          ++cnt;
        }
      }
      bp_count[j] = cnt;
    }
    // Expand breakpoints into sublen.
    const Breakpoint* bp = arena.data() + bp_start[j];
    int prev = kMinMatch;
    for (int c = 0; c < bp_count[j]; ++c) {
      for (int k = prev; k <= bp[c].len; ++k) sublen[k] = bp[c].dist;
      prev = bp[c].len + 1;
    }
    *dist = best_dist[j];
    return best_len[j];
  }
};

// Cost model: cost of emitting (litlen, dist).  dist==0 -> literal.
struct CostModel {
  const double* ll;  // 288 entries, bits per litlen symbol
  const double* d;   // 32 entries, bits per dist symbol
  bool fixed;

  inline double Cost(unsigned litlen, unsigned dist) const {
    if (fixed) {
      if (dist == 0) return litlen <= 143 ? 8 : 9;
      int lsym = LengthSymbol((int)litlen);
      double c = lsym <= 279 ? 7 : 8;
      return c + 5 + DistExtraBits((int)dist) + LengthExtraBits((int)litlen);
    }
    if (dist == 0) return ll[litlen];
    return LengthExtraBits((int)litlen) + DistExtraBits((int)dist) +
           ll[LengthSymbol((int)litlen)] + d[DistSymbol((int)dist)];
  }

  double MinCost() const {
    // Cheapest possible symbol cost under this model (squeeze.c:163-198).
    static const int dfirst[30] = {1, 2, 3, 4, 5, 7, 9, 13, 17, 25,
                                   33, 49, 65, 97, 129, 193, 257, 385, 513,
                                   769, 1025, 1537, 2049, 3073, 4097, 6145,
                                   8193, 12289, 16385, 24577};
    double minlen = kLargeFloat;
    int bestl = 0;
    for (int i = 3; i < 259; ++i) {
      double c = Cost(i, 1);
      if (c < minlen) {
        minlen = c;
        bestl = i;
      }
    }
    double mind = kLargeFloat;
    int bestd = 0;
    for (int i = 0; i < 30; ++i) {
      double c = Cost(3, dfirst[i]);
      if (c < mind) {
        mind = c;
        bestd = dfirst[i];
      }
    }
    return Cost(bestl, bestd);
  }
};

// Forward DP + traceback: one squeeze run (reference squeeze.c:217-336),
// except distances are recorded during relaxation so no re-walk is needed.
static int64_t SqueezeRun(BlockEngine& eng, const CostModel& cm,
                          uint16_t* out_litlens, uint16_t* out_dists) {
  const uint8_t* data = eng.data;
  int64_t instart = eng.instart, inend = eng.inend;
  int64_t bs = inend - instart;
  if (bs == 0) return 0;

  ChainIndex ix;
  int64_t windowstart = instart > kWindowSize ? instart - kWindowSize : 0;
  ix.Warmup(data, windowstart, inend);
  for (int64_t i = windowstart; i < instart; ++i) ix.Insert(data, i, inend);

  float* costs = eng.costs.data();
  uint16_t* len_arr = eng.len_arr.data();
  uint16_t* dist_arr = eng.dist_arr.data();
  for (int64_t i = 1; i <= bs; ++i) costs[i] = (float)kLargeFloat;
  costs[0] = 0;
  len_arr[0] = 0;

  double mincost = cm.MinCost();
  uint16_t sublen[kMaxMatch + 1];

  for (int64_t i = instart; i < inend; ++i) {
    int64_t j = i - instart;
    ix.Insert(data, i, inend);

    // Long identical-run shortcut (squeeze.c:251-271): inside a long run,
    // force kMaxMatch steps without match searches.
    if (ix.run[i & kWindowMask] > kMaxMatch * 2 &&
        i > instart + kMaxMatch + 1 && i + kMaxMatch * 2 + 1 < inend &&
        ix.run[(i - kMaxMatch) & kWindowMask] > kMaxMatch) {
      double symbolcost = cm.Cost(kMaxMatch, 1);
      for (int k = 0; k < kMaxMatch; ++k) {
        costs[j + kMaxMatch] = (float)(costs[j] + symbolcost);
        len_arr[j + kMaxMatch] = kMaxMatch;
        dist_arr[j + kMaxMatch] = 1;
        ++i;
        ++j;
        ix.Insert(data, i, inend);
      }
    }

    uint16_t dist;
    uint16_t leng = eng.Candidates(ix, j, sublen, &dist);

    // Literal edge.
    if (i + 1 <= inend) {
      double newcost = cm.Cost(data[i], 0) + costs[j];
      if (newcost < costs[j + 1]) {
        costs[j + 1] = (float)newcost;
        len_arr[j + 1] = 1;
        dist_arr[j + 1] = 0;
      }
    }
    // Match edges at every length, each at its min distance.
    int64_t kend = leng < inend - i ? leng : inend - i;
    double mincostaddcostj = mincost + costs[j];
    for (int64_t k = kMinMatch; k <= kend; ++k) {
      if (costs[j + k] <= mincostaddcostj) continue;
      double newcost = cm.Cost((unsigned)k, sublen[k]) + costs[j];
      if (newcost < costs[j + k]) {
        costs[j + k] = (float)newcost;
        len_arr[j + k] = (uint16_t)k;
        dist_arr[j + k] = sublen[k];
      }
    }
  }

  // Traceback (reference TraceBackwards), emitting (litlen, dist) pairs.
  int64_t nsyms = 0;
  {
    int64_t idx = bs;
    while (idx > 0) {
      ++nsyms;
      idx -= len_arr[idx];
    }
  }
  int64_t idx = bs;
  int64_t w = nsyms;
  while (idx > 0) {
    --w;
    uint16_t l = len_arr[idx];
    if (l >= kMinMatch) {
      out_litlens[w] = l;
      out_dists[w] = dist_arr[idx];
    } else {
      out_litlens[w] = data[instart + idx - 1];
      out_dists[w] = 0;
    }
    idx -= l;
  }
  return nsyms;
}

// ---------------------------------------------------------------------------
// Checksums (RFC 1952 CRC-32, RFC 1950 Adler-32) with combine support.
// ---------------------------------------------------------------------------

struct Crc32Table {
  uint32_t t[8][256];
  Crc32Table() {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xedb88320u ^ (c >> 1) : c >> 1;
      t[0][i] = c;
    }
    for (uint32_t i = 0; i < 256; ++i)
      for (int j = 1; j < 8; ++j)
        t[j][i] = (t[j - 1][i] >> 8) ^ t[0][t[j - 1][i] & 0xff];
  }
};
static const Crc32Table g_crc;

static uint32_t Crc32(uint32_t crc, const uint8_t* p, int64_t n) {
  crc = ~crc;
  while (n >= 8) {
    crc ^= (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
           ((uint32_t)p[3] << 24);
    uint32_t hi = (uint32_t)p[4] | ((uint32_t)p[5] << 8) |
                  ((uint32_t)p[6] << 16) | ((uint32_t)p[7] << 24);
    crc = g_crc.t[7][crc & 0xff] ^ g_crc.t[6][(crc >> 8) & 0xff] ^
          g_crc.t[5][(crc >> 16) & 0xff] ^ g_crc.t[4][crc >> 24] ^
          g_crc.t[3][hi & 0xff] ^ g_crc.t[2][(hi >> 8) & 0xff] ^
          g_crc.t[1][(hi >> 16) & 0xff] ^ g_crc.t[0][hi >> 24];
    p += 8;
    n -= 8;
  }
  while (n-- > 0) crc = g_crc.t[0][(crc ^ *p++) & 0xff] ^ (crc >> 8);
  return ~crc;
}

static uint32_t Adler32(uint32_t adler, const uint8_t* p, int64_t n) {
  uint32_t s1 = adler & 0xffff, s2 = (adler >> 16) & 0xffff;
  while (n > 0) {
    int64_t chunk = n > 5552 ? 5552 : n;
    n -= chunk;
    while (chunk-- > 0) {
      s1 += *p++;
      s2 += s1;
    }
    s1 %= 65521;
    s2 %= 65521;
  }
  return (s2 << 16) | s1;
}

}  // namespace zt

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

int64_t zt_greedy(const uint8_t* data, int64_t instart, int64_t inend,
                  uint16_t* out_litlens, uint16_t* out_dists) {
  return zt::GreedyParse(data, instart, inend, out_litlens, out_dists);
}

void* zt_block_new(const uint8_t* data, int64_t instart, int64_t inend) {
  return new zt::BlockEngine(data, instart, inend);
}

void zt_block_free(void* eng) { delete (zt::BlockEngine*)eng; }

// One squeeze run.  ll_cost/d_cost may be null for the fixed-tree model.
int64_t zt_squeeze_run(void* eng, const double* ll_cost, const double* d_cost,
                       uint16_t* out_litlens, uint16_t* out_dists) {
  zt::CostModel cm;
  cm.fixed = (ll_cost == nullptr);
  cm.ll = ll_cost;
  cm.d = d_cost;
  return zt::SqueezeRun(*(zt::BlockEngine*)eng, cm, out_litlens, out_dists);
}

uint32_t zt_crc32(uint32_t crc, const uint8_t* data, int64_t n) {
  return zt::Crc32(crc, data, n);
}

uint32_t zt_adler32(uint32_t adler, const uint8_t* data, int64_t n) {
  return zt::Adler32(adler, data, n);
}

}  // extern "C"
