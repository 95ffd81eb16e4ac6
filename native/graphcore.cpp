// graphcore: native host-side graph runtime for the TPU LightGCN framework.
//
// TPU-native replacement for the reference's external native dependencies
// (SURVEY §2.3): PyG's ClusterData → METIS C partitioner (reference
// data/dataset_handler.py:273) and torch-sparse's CSR machinery. The TPU does
// the math; this library does the irregular host-side graph work that NumPy is
// slow at on 25M-edge inputs:
//
//   * gc_build_csr        — dst-sorted CSR (rowptr/col/weight) with symmetric
//                           GCN normalization (counting sort, O(E))
//   * gc_partition_greedy — degree-balanced snake user assignment + majority-
//                           vote item assignment (the METIS-free Cluster-GCN
//                           partitioner; same algorithm as
//                           data/partition.py::partition_bipartite_greedy)
//   * gc_to_undirected    — doubling + sort + dedup of the bipartite edge list
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). All buffers are
// caller-allocated; functions return element counts or negative error codes.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Build dst-sorted CSR with GCN-normalized weights.
//   src, dst: E global node ids; n: node count.
//   out_rowptr: n+1 int64; out_col: E int32; out_w: E float.
int64_t gc_build_csr(const int32_t* src, const int32_t* dst, int64_t e,
                     int64_t n, int64_t* out_rowptr, int32_t* out_col,
                     float* out_w) {
  std::vector<int64_t> deg(n, 0);
  for (int64_t i = 0; i < e; ++i) deg[dst[i]]++;
  out_rowptr[0] = 0;
  for (int64_t i = 0; i < n; ++i) out_rowptr[i + 1] = out_rowptr[i] + deg[i];
  std::vector<float> dinv(n);
  for (int64_t i = 0; i < n; ++i)
    dinv[i] = deg[i] > 0 ? 1.0f / std::sqrt(static_cast<float>(deg[i])) : 0.0f;
  std::vector<int64_t> cursor(out_rowptr, out_rowptr + n);
  for (int64_t i = 0; i < e; ++i) {
    int64_t p = cursor[dst[i]]++;
    out_col[p] = src[i];
    out_w[p] = dinv[src[i]] * dinv[dst[i]];
  }
  return e;
}

// Degree-balanced greedy bipartite partition (Cluster-GCN analog).
//   u, it: the E_fwd user→item half-edges (dense user idx / dense item idx).
//   out_part_user: num_users int32; out_part_item: num_items int32.
// Returns number of intra-cluster half-edges kept.
int64_t gc_partition_greedy(const int32_t* u, const int32_t* it, int64_t e,
                            int64_t num_users, int64_t num_items,
                            int32_t num_parts, uint64_t seed,
                            int32_t* out_part_user, int32_t* out_part_item) {
  // user degrees
  std::vector<int64_t> udeg(num_users, 0);
  for (int64_t i = 0; i < e; ++i) udeg[u[i]]++;
  // order users by degree desc (stable)
  std::vector<int32_t> order(num_users);
  for (int64_t i = 0; i < num_users; ++i) order[i] = static_cast<int32_t>(i);
  std::stable_sort(order.begin(), order.end(),
                   [&](int32_t a, int32_t b) { return udeg[a] > udeg[b]; });
  // snake deal over parts balances degree mass
  for (int64_t r = 0; r < num_users; ++r) {
    int64_t lane = r % (2 * num_parts);
    int32_t p = static_cast<int32_t>(lane < num_parts ? lane
                                                      : 2 * num_parts - 1 - lane);
    out_part_user[order[r]] = p;
  }
  // item -> plurality part among its edges
  std::vector<int32_t> counts(num_items * num_parts, 0);
  for (int64_t i = 0; i < e; ++i)
    counts[static_cast<int64_t>(it[i]) * num_parts + out_part_user[u[i]]]++;
  uint64_t state = seed * 6364136223846793005ULL + 1442695040888963407ULL;
  for (int64_t j = 0; j < num_items; ++j) {
    const int32_t* row = &counts[j * num_parts];
    int32_t best = 0, best_c = row[0];
    int64_t total = row[0];
    for (int32_t p = 1; p < num_parts; ++p) {
      total += row[p];
      if (row[p] > best_c) { best_c = row[p]; best = p; }
    }
    if (total == 0) {  // unseen item: spread pseudo-uniformly
      state = state * 6364136223846793005ULL + 1442695040888963407ULL;
      best = static_cast<int32_t>((state >> 33) % num_parts);
    }
    out_part_item[j] = best;
  }
  int64_t kept = 0;
  for (int64_t i = 0; i < e; ++i)
    if (out_part_user[u[i]] == out_part_item[it[i]]) kept++;
  return kept;
}

// Capacity-constrained label-propagation refinement of a bipartite partition.
// Alternates user-side and item-side plurality moves, each constrained so no
// part exceeds ``slack``× its fair share of edge mass — the balance guarantee
// METIS gives that plain label propagation lacks. Improves intra-cluster edge
// retention substantially on community-structured graphs.
// Returns kept half-edges after refinement.
static void refine_side(const int32_t* a, const int32_t* b, int64_t e,
                        int64_t num_a, int32_t num_parts, double slack,
                        int32_t* part_a, const int32_t* part_b) {
  std::vector<int32_t> counts(num_a * num_parts, 0);
  std::vector<int64_t> deg(num_a, 0);
  for (int64_t i = 0; i < e; ++i) {
    counts[static_cast<int64_t>(a[i]) * num_parts + part_b[b[i]]]++;
    deg[a[i]]++;
  }
  int64_t cap = static_cast<int64_t>(slack * static_cast<double>(e) / num_parts) + 1;
  // nodes in affinity order (best count desc) so strong preferences win slots
  std::vector<int32_t> best(num_a);
  std::vector<int32_t> bestc(num_a);
  for (int64_t v = 0; v < num_a; ++v) {
    const int32_t* row = &counts[v * num_parts];
    int32_t bp = part_a[v];
    int32_t bc = -1;
    for (int32_t p = 0; p < num_parts; ++p)
      if (row[p] > bc) { bc = row[p]; bp = p; }
    best[v] = bp;
    bestc[v] = bc;
  }
  std::vector<int32_t> order(num_a);
  for (int64_t v = 0; v < num_a; ++v) order[v] = static_cast<int32_t>(v);
  std::stable_sort(order.begin(), order.end(),
                   [&](int32_t x, int32_t y) { return bestc[x] > bestc[y]; });
  std::vector<int64_t> load(num_parts, 0);
  for (int64_t r = 0; r < num_a; ++r) {
    int32_t v = order[r];
    int32_t want = best[v];
    int32_t cur = part_a[v];
    int32_t chosen;
    if (load[want] + deg[v] <= cap) {
      chosen = want;
    } else if (load[cur] + deg[v] <= cap) {
      chosen = cur;
    } else {
      chosen = 0;
      for (int32_t p = 1; p < num_parts; ++p)
        if (load[p] < load[chosen]) chosen = p;
    }
    part_a[v] = chosen;
    load[chosen] += deg[v];
  }
}

int64_t gc_partition_refine(const int32_t* u, const int32_t* it, int64_t e,
                            int64_t num_users, int64_t num_items,
                            int32_t num_parts, int32_t rounds, double slack,
                            int32_t* part_user, int32_t* part_item) {
  for (int32_t r = 0; r < rounds; ++r) {
    refine_side(it, u, e, num_items, num_parts, slack, part_item, part_user);
    refine_side(u, it, e, num_users, num_parts, slack, part_user, part_item);
  }
  int64_t kept = 0;
  for (int64_t i = 0; i < e; ++i)
    if (part_user[u[i]] == part_item[it[i]]) kept++;
  return kept;
}

// Kept-edge balance pass: cap every part's intra-cluster (kept) edge count at
// ``tol``× the mean by moving the least-loyal users out of overloaded parts.
// METIS balances node/edge mass; for Cluster-GCN training cost what matters is
// the KEPT edge count per part (it sets the padded triplet batch width every
// step), which plurality item assignment leaves heavily skewed on
// community-structured graphs. Items stay fixed; each moved user lands on its
// best-affinity part that stays under the cap (edges follow: kept loss =
// c_src(v) − c_dst(v)). Returns kept half-edges after balancing.
int64_t gc_partition_balance(const int32_t* u, const int32_t* it, int64_t e,
                             int64_t num_users, int32_t num_parts, double tol,
                             int32_t* part_user, const int32_t* part_item) {
  // c[v][q] = # edges of user v to items in part q
  std::vector<int32_t> counts(num_users * num_parts, 0);
  std::vector<int64_t> kept(num_parts, 0);
  for (int64_t i = 0; i < e; ++i) {
    int32_t q = part_item[it[i]];
    counts[static_cast<int64_t>(u[i]) * num_parts + q]++;
    if (part_user[u[i]] == q) kept[part_user[u[i]]]++;
  }
  int64_t total = 0;
  for (int32_t p = 0; p < num_parts; ++p) total += kept[p];
  int64_t target = static_cast<int64_t>(tol * static_cast<double>(total) / num_parts) + 1;

  // Caps on each part's KEPT-user and KEPT-item counts: those set the compact
  // trainer's padded node width (u_pad/i_pad = the LARGEST cluster's unique
  // users/items among kept edges), which in turn sets dense-Â block size and
  // the fused-BPR kernel's VMEM footprint. Without them, moves pile
  // low-kept-degree users into underloaded parts and inflate the pads.
  int64_t num_items = 0;
  for (int64_t i = 0; i < e; ++i) num_items = std::max<int64_t>(num_items, it[i] + 1);
  std::vector<int32_t> kedge_item(num_items, 0);   // item's kept-edge count
  for (int64_t i = 0; i < e; ++i)
    if (part_user[u[i]] == part_item[it[i]]) kedge_item[it[i]]++;
  std::vector<int64_t> kuser(num_parts, 0), kitem(num_parts, 0);
  for (int64_t v = 0; v < num_users; ++v)
    if (counts[v * num_parts + part_user[v]] > 0) kuser[part_user[v]]++;
  for (int64_t j = 0; j < num_items; ++j)
    if (kedge_item[j] > 0) kitem[part_item[j]]++;
  int64_t kumax = 0, kimax = 0;
  for (int32_t p = 0; p < num_parts; ++p) {
    kumax = std::max(kumax, kuser[p]);
    kimax = std::max(kimax, kitem[p]);
  }
  // per-user edge CSR (counting sort by user) for incremental item updates
  std::vector<int64_t> uptr(num_users + 1, 0);
  for (int64_t i = 0; i < e; ++i) uptr[u[i] + 1]++;
  for (int64_t v = 0; v < num_users; ++v) uptr[v + 1] += uptr[v];
  std::vector<int32_t> uadj(e);
  {
    std::vector<int64_t> cur(uptr.begin(), uptr.end() - 1);
    for (int64_t i = 0; i < e; ++i) uadj[cur[u[i]]++] = it[i];
  }

  // per-part user lists
  std::vector<std::vector<int32_t>> members(num_parts);
  for (int64_t v = 0; v < num_users; ++v)
    members[part_user[v]].push_back(static_cast<int32_t>(v));

  // overloaded parts, worst first
  std::vector<int32_t> over;
  for (int32_t p = 0; p < num_parts; ++p)
    if (kept[p] > target) over.push_back(p);
  std::sort(over.begin(), over.end(),
            [&](int32_t a, int32_t b) { return kept[a] > kept[b]; });

  for (int32_t p : over) {
    // order this part's users by in-part edge count ascending: moving a
    // low-count user out sheds few kept edges per move but costs the least
    // retention; we take them cheapest-first until under target
    auto& vs = members[p];
    std::stable_sort(vs.begin(), vs.end(), [&](int32_t a, int32_t b) {
      return counts[static_cast<int64_t>(a) * num_parts + p] <
             counts[static_cast<int64_t>(b) * num_parts + p];
    });
    for (int32_t v : vs) {
      if (kept[p] <= target) break;
      const int32_t* row = &counts[static_cast<int64_t>(v) * num_parts];
      // best destination with room (affinity desc), honoring the pad caps
      int32_t best = -1;
      int32_t best_c = -1;
      for (int32_t q = 0; q < num_parts; ++q) {
        if (q == p) continue;
        if (kept[q] + row[q] > target) continue;
        if (row[q] > 0 && kuser[q] + 1 > kumax) continue;
        if (row[q] > best_c) { best_c = row[q]; best = q; }
      }
      if (best < 0) continue;
      // newly covered items in the destination must not exceed its item cap
      if (row[best] > 0) {
        int64_t fresh = 0;
        for (int64_t i = uptr[v]; i < uptr[v + 1]; ++i) {
          int32_t j = uadj[i];
          if (part_item[j] == best && kedge_item[j] == 0) fresh++;
        }
        if (kitem[best] + fresh > kimax) continue;
      }
      // commit the move: kept totals, kept-user counts, kept-item coverage
      kept[p] -= row[p];
      kept[best] += row[best];
      if (row[p] > 0) kuser[p]--;
      if (row[best] > 0) kuser[best]++;
      for (int64_t i = uptr[v]; i < uptr[v + 1]; ++i) {
        int32_t j = uadj[i];
        if (part_item[j] == p) {
          if (--kedge_item[j] == 0) kitem[p]--;
        } else if (part_item[j] == best) {
          if (kedge_item[j]++ == 0) kitem[best]++;
        }
      }
      part_user[v] = best;
    }
  }
  int64_t kept_total = 0;
  for (int64_t i = 0; i < e; ++i)
    if (part_user[u[i]] == part_item[it[i]]) kept_total++;
  return kept_total;
}

// Undirected doubling + dedup. Caller provides out buffers of size 2E.
// Returns deduped edge count.
int64_t gc_to_undirected(const int32_t* src, const int32_t* dst, int64_t e,
                         int64_t n, int32_t* out_src, int32_t* out_dst) {
  std::vector<uint64_t> keys(2 * e);
  for (int64_t i = 0; i < e; ++i) {
    keys[i] = static_cast<uint64_t>(src[i]) * n + dst[i];
    keys[e + i] = static_cast<uint64_t>(dst[i]) * n + src[i];
  }
  std::sort(keys.begin(), keys.end());
  int64_t m = 0;
  for (int64_t i = 0; i < 2 * e; ++i) {
    if (i > 0 && keys[i] == keys[i - 1]) continue;
    out_src[m] = static_cast<int32_t>(keys[i] / n);
    out_dst[m] = static_cast<int32_t>(keys[i] % n);
    ++m;
  }
  return m;
}

// Per-user positive-item offsets for exact negative-sampling feasibility:
// builds sorted (user, item) hash keys (Cantor pairing, reference
// utils/helpers.py:11-22 semantics but 64-bit mix to avoid overflow).
int64_t gc_member_hashes(const int32_t* u, const int32_t* it, int64_t e,
                         uint64_t* out_hash) {
  for (int64_t i = 0; i < e; ++i) {
    uint64_t x = static_cast<uint64_t>(u[i]);
    uint64_t y = static_cast<uint64_t>(it[i]);
    uint64_t s = x + y;
    out_hash[i] = s * (s + 1) / 2 + y;
  }
  std::sort(out_hash, out_hash + e);
  int64_t m = 0;
  for (int64_t i = 0; i < e; ++i) {
    if (i > 0 && out_hash[i] == out_hash[i - 1]) continue;
    out_hash[m++] = out_hash[i];
  }
  return m;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// CSV ratings ingest: the native data-loader leg of the runtime. The reference
// reads ml-25m's 25M-row ratings.csv through pandas (dataset_handler.py:105);
// this parses "userId,movieId,rating[,timestamp]" with mmap + threads and the
// rating>=min filter fused in, preserving file order (the dense id maps are
// first-appearance ordered, so order matters).
// ---------------------------------------------------------------------------

namespace {

struct MappedFile {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
  explicit MappedFile(const char* path) {
    fd = open(path, O_RDONLY);
    if (fd < 0) return;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) { close(fd); fd = -1; return; }
    void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) { close(fd); fd = -1; return; }
    data = static_cast<const char*>(p);
    size = st.st_size;
  }
  ~MappedFile() {
    if (data) munmap(const_cast<char*>(data), size);
    if (fd >= 0) close(fd);
  }
};

// parse one data line; returns false if malformed or filtered out
inline bool parse_line(const char* p, const char* end, float min_rating,
                       int32_t* user, int32_t* movie) {
  int64_t a = 0;
  if (p >= end || *p < '0' || *p > '9') return false;
  while (p < end && *p >= '0' && *p <= '9') a = a * 10 + (*p++ - '0');
  if (p >= end || *p != ',') return false;
  ++p;
  int64_t b = 0;
  if (p >= end || *p < '0' || *p > '9') return false;
  while (p < end && *p >= '0' && *p <= '9') b = b * 10 + (*p++ - '0');
  if (p >= end || *p != ',') return false;
  ++p;
  // rating: digits[.digits]
  double r = 0;
  while (p < end && *p >= '0' && *p <= '9') r = r * 10 + (*p++ - '0');
  if (p < end && *p == '.') {
    ++p;
    double f = 0.1;
    while (p < end && *p >= '0' && *p <= '9') { r += (*p++ - '0') * f; f *= 0.1; }
  }
  if (r < min_rating) return false;
  *user = static_cast<int32_t>(a);
  *movie = static_cast<int32_t>(b);
  return true;
}

}  // namespace

extern "C" {

// Count data lines (excluding the header) — sizes the caller's buffers.
int64_t gc_count_csv_lines(const char* path) {
  MappedFile f(path);
  if (!f.ok()) return -1;
  int64_t lines = 0;
  const char* p = f.data;
  const char* end = f.data + f.size;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    ++lines;
    if (!nl) break;
    p = nl + 1;
  }
  if (f.size && f.data[f.size - 1] == '\n') { /* counted by loop */ }
  return std::max<int64_t>(0, lines - 1);  // minus header
}

// Parse ratings.csv, keep rows with rating >= min_rating, file order
// preserved. out buffers must hold gc_count_csv_lines(path) entries.
// Returns kept-row count (or -1 on IO error).
int64_t gc_load_ratings_csv(const char* path, float min_rating,
                            int32_t* out_user, int32_t* out_movie) {
  MappedFile f(path);
  if (!f.ok()) return -1;
  const char* begin = f.data;
  const char* end = f.data + f.size;
  // skip header line
  const char* first = static_cast<const char*>(memchr(begin, '\n', f.size));
  if (!first) return 0;
  begin = first + 1;

  unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  nt = std::min(nt, 8u);
  size_t span = (end - begin) / nt + 1;
  std::vector<const char*> starts(nt + 1);
  starts[0] = begin;
  for (unsigned t = 1; t < nt; ++t) {
    const char* guess = begin + t * span;
    if (guess >= end) { starts[t] = end; continue; }
    const char* nl = static_cast<const char*>(memchr(guess, '\n', end - guess));
    starts[t] = nl ? nl + 1 : end;
  }
  starts[nt] = end;

  std::vector<std::vector<int32_t>> users(nt), movies(nt);
  std::vector<std::thread> threads;
  for (unsigned t = 0; t < nt; ++t) {
    threads.emplace_back([&, t]() {
      const char* p = starts[t];
      const char* stop = starts[t + 1];
      users[t].reserve((stop - p) / 24 + 16);
      movies[t].reserve((stop - p) / 24 + 16);
      while (p < stop) {
        const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
        const char* line_end = nl ? nl : end;
        int32_t uu, mm;
        if (parse_line(p, line_end, min_rating, &uu, &mm)) {
          users[t].push_back(uu);
          movies[t].push_back(mm);
        }
        if (!nl || nl >= stop) break;
        p = nl + 1;
      }
    });
  }
  for (auto& th : threads) th.join();

  int64_t total = 0;
  for (unsigned t = 0; t < nt; ++t) {
    std::memcpy(out_user + total, users[t].data(), users[t].size() * 4);
    std::memcpy(out_movie + total, movies[t].data(), movies[t].size() * 4);
    total += static_cast<int64_t>(users[t].size());
  }
  return total;
}

}  // extern "C"
