// Native KGE sampling / evaluation backend.
//
// A from-scratch reimplementation of the behavior of OpenKE's Base.so
// (reference OpenKE/openke/base/*.h, Base.cpp) with the same extern "C"
// surface, so existing ctypes callers work unchanged:
//
//   setInPath / setTrainPath / setValidPath / setTestPath / setEntPath /
//   setRelPath / setBern / setWorkThreads / randReset
//   importTrainFiles / importTestFiles / importTypeFiles
//   getEntityTotal / getRelationTotal / getTrainTotal / getTestTotal /
//   getValidTotal / getTripleTotal
//   sampling(batch_h, batch_t, batch_r, batch_y, batchSize, negRate,
//            negRelRate, mode, filter_flag, p, val_loss)
//   initTest / getHeadBatch / getTailBatch / testHead / testTail /
//   test_link_prediction / getTestLink{MRR,MR,Hit10,Hit3,Hit1}
//
// Behavioral contract kept bit-for-bit where it matters for reproducibility:
//  * per-thread LCG x <- x * 25214903917 + 11, seeded from C rand() without
//    srand (deterministic across runs), same draw order per sampled triple
//    (pick, side-choice, corrupt) so batches match the reference generator;
//  * train triples are deduplicated after sorting by (h, r, t);
//  * "filtered" corruption draws uniformly from the entities that do NOT form
//    a known train triple, via the order-statistics skip trick over the
//    per-(entity, relation) sorted neighbor range;
//  * Bernoulli corruption picks the tail side with probability
//    right_mean / (left_mean + right_mean), where left_mean[r] =
//    triples(r)/distinct heads(r) and right_mean[r] = triples(r)/distinct
//    tails(r);
//  * link-prediction rank = 1 + #{candidates scoring strictly below the
//    ground truth}, filtered variant skipping known train/valid/test triples,
//    metrics averaged over head and tail substitution.
//
// Build: see Makefile (g++ -O3 -fPIC -shared -pthread).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

using INT = int64_t;
using REAL = float;

namespace {

struct Triple {
  INT h, r, t;
  bool operator==(const Triple &o) const { return h == o.h && r == o.r && t == o.t; }
};

inline bool lessHRT(const Triple &a, const Triple &b) {
  if (a.h != b.h) return a.h < b.h;
  if (a.r != b.r) return a.r < b.r;
  return a.t < b.t;
}
inline bool lessTRH(const Triple &a, const Triple &b) {
  if (a.t != b.t) return a.t < b.t;
  if (a.r != b.r) return a.r < b.r;
  return a.h < b.h;
}
inline bool lessHTR(const Triple &a, const Triple &b) {
  if (a.h != b.h) return a.h < b.h;
  if (a.t != b.t) return a.t < b.t;
  return a.r < b.r;
}

struct Store {
  std::string in_path;
  std::string train_file, valid_file, test_file, ent_file, rel_file;
  INT work_threads = 1;
  INT bern_flag = 0;

  INT entity_total = 0, relation_total = 0;
  std::vector<Triple> train;        // dedup, insertion irrelevant (sorted HRT)
  std::vector<Triple> by_head;      // sorted (h, r, t)
  std::vector<Triple> by_tail;      // sorted (t, r, h)
  std::vector<Triple> by_pair;      // sorted (h, t, r) — for relation corruption
  std::vector<INT> head_lo, head_hi;  // per-entity [lo, hi) into by_head
  std::vector<INT> tail_lo, tail_hi;
  std::vector<INT> pair_lo, pair_hi;
  std::vector<REAL> left_mean, right_mean;

  std::vector<Triple> valid, test, all_sorted;  // all_sorted: (h, r, t) order

  // type constraints: per relation, sorted candidate heads / tails
  std::vector<std::vector<INT>> type_heads, type_tails;
  bool has_types = false;
};

Store S;

// ---------------------------------------------------------------------------
// RNG — LCG identical to the reference (Random.h:18-29)
// ---------------------------------------------------------------------------
std::vector<unsigned long long> g_rand_state;

inline unsigned long long next_rand(INT id) {
  g_rand_state[id] = g_rand_state[id] * 25214903917ULL + 11ULL;
  return g_rand_state[id];
}

inline INT rand_below(INT id, INT x) {
  INT res = (INT)(next_rand(id) % (unsigned long long)x);
  while (res < 0) res += x;
  return res;
}

// ---------------------------------------------------------------------------
// File IO
// ---------------------------------------------------------------------------
INT read_count(const std::string &path) {
  FILE *f = fopen(path.c_str(), "r");
  if (!f) { fprintf(stderr, "kge_base: cannot open %s\n", path.c_str()); return 0; }
  long long n = 0;
  if (fscanf(f, "%lld", &n) != 1) n = 0;
  fclose(f);
  return (INT)n;
}

std::vector<Triple> read_triples(const std::string &path) {
  std::vector<Triple> out;
  FILE *f = fopen(path.c_str(), "r");
  if (!f) { fprintf(stderr, "kge_base: cannot open %s\n", path.c_str()); return out; }
  long long n = 0;
  if (fscanf(f, "%lld", &n) == 1) {
    out.reserve(n);
    for (long long i = 0; i < n; i++) {
      long long h, t, r;
      if (fscanf(f, "%lld %lld %lld", &h, &t, &r) != 3) break;
      out.push_back({(INT)h, (INT)r, (INT)t});
    }
  }
  fclose(f);
  return out;
}

void build_ranges(const std::vector<Triple> &arr, std::vector<INT> &lo,
                  std::vector<INT> &hi, bool key_is_head) {
  lo.assign(S.entity_total, 0);
  hi.assign(S.entity_total, 0);
  size_t i = 0;
  while (i < arr.size()) {
    INT key = key_is_head ? arr[i].h : arr[i].t;
    size_t j = i;
    while (j < arr.size() && (key_is_head ? arr[j].h : arr[j].t) == key) j++;
    lo[key] = (INT)i;
    hi[key] = (INT)j;
    i = j;
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// Configuration setters (Setting.h parity)
// ---------------------------------------------------------------------------
extern "C" void setInPath(char *path) { S.in_path = path; }
extern "C" void setTrainPath(char *path) { S.train_file = path; }
extern "C" void setValidPath(char *path) { S.valid_file = path; }
extern "C" void setTestPath(char *path) { S.test_file = path; }
extern "C" void setEntPath(char *path) { S.ent_file = path; }
extern "C" void setRelPath(char *path) { S.rel_file = path; }
extern "C" void setOutPath(char *) {}
extern "C" void setWorkThreads(INT n) { S.work_threads = n > 0 ? n : 1; }
extern "C" void setBern(INT b) { S.bern_flag = b; }
extern "C" INT getWorkThreads() { return S.work_threads; }
extern "C" INT getEntityTotal() { return S.entity_total; }
extern "C" INT getRelationTotal() { return S.relation_total; }
extern "C" INT getTrainTotal() { return (INT)S.train.size(); }
extern "C" INT getValidTotal() { return (INT)S.valid.size(); }
extern "C" INT getTestTotal() { return (INT)S.test.size(); }
extern "C" INT getTripleTotal() {
  return (INT)(S.train.size() + S.valid.size() + S.test.size());
}

extern "C" void randReset() {
  g_rand_state.assign(S.work_threads, 0);
  for (INT i = 0; i < S.work_threads; i++) g_rand_state[i] = rand();
}

// ---------------------------------------------------------------------------
// Import
// ---------------------------------------------------------------------------
extern "C" void importTrainFiles() {
  const std::string rel = S.rel_file.empty() ? S.in_path + "relation2id.txt" : S.rel_file;
  const std::string ent = S.ent_file.empty() ? S.in_path + "entity2id.txt" : S.ent_file;
  const std::string trn = S.train_file.empty() ? S.in_path + "train2id.txt" : S.train_file;
  S.relation_total = read_count(rel);
  S.entity_total = read_count(ent);
  printf("The total of relations is %lld.\n", (long long)S.relation_total);
  printf("The total of entities is %lld.\n", (long long)S.entity_total);

  std::vector<Triple> raw = read_triples(trn);
  std::sort(raw.begin(), raw.end(), lessHRT);
  raw.erase(std::unique(raw.begin(), raw.end()), raw.end());
  S.train = raw;
  printf("The total of train triples is %lld.\n", (long long)S.train.size());

  S.by_head = S.train;                       // already (h, r, t)-sorted
  S.by_tail = S.train;
  std::sort(S.by_tail.begin(), S.by_tail.end(), lessTRH);
  S.by_pair = S.train;
  std::sort(S.by_pair.begin(), S.by_pair.end(), lessHTR);

  build_ranges(S.by_head, S.head_lo, S.head_hi, true);
  build_ranges(S.by_tail, S.tail_lo, S.tail_hi, false);
  build_ranges(S.by_pair, S.pair_lo, S.pair_hi, true);

  // Bernoulli statistics.
  std::vector<REAL> freq(S.relation_total, 0), dheads(S.relation_total, 0),
      dtails(S.relation_total, 0);
  for (const Triple &x : S.train) freq[x.r] += 1;
  for (size_t i = 0; i < S.by_head.size(); i++)
    if (i == 0 || S.by_head[i].h != S.by_head[i - 1].h || S.by_head[i].r != S.by_head[i - 1].r)
      dheads[S.by_head[i].r] += 1;
  for (size_t i = 0; i < S.by_tail.size(); i++)
    if (i == 0 || S.by_tail[i].t != S.by_tail[i - 1].t || S.by_tail[i].r != S.by_tail[i - 1].r)
      dtails[S.by_tail[i].r] += 1;
  S.left_mean.assign(S.relation_total, 0);
  S.right_mean.assign(S.relation_total, 0);
  for (INT r = 0; r < S.relation_total; r++) {
    if (dheads[r] > 0) S.left_mean[r] = freq[r] / dheads[r];
    if (dtails[r] > 0) S.right_mean[r] = freq[r] / dtails[r];
  }
}

extern "C" void importTestFiles() {
  const std::string rel = S.rel_file.empty() ? S.in_path + "relation2id.txt" : S.rel_file;
  const std::string ent = S.ent_file.empty() ? S.in_path + "entity2id.txt" : S.ent_file;
  if (!S.relation_total) S.relation_total = read_count(rel);
  if (!S.entity_total) S.entity_total = read_count(ent);
  S.valid = read_triples(S.valid_file.empty() ? S.in_path + "valid2id.txt" : S.valid_file);
  S.test = read_triples(S.test_file.empty() ? S.in_path + "test2id.txt" : S.test_file);
  S.all_sorted.clear();
  S.all_sorted.reserve(S.train.size() + S.valid.size() + S.test.size());
  S.all_sorted.insert(S.all_sorted.end(), S.train.begin(), S.train.end());
  S.all_sorted.insert(S.all_sorted.end(), S.valid.begin(), S.valid.end());
  S.all_sorted.insert(S.all_sorted.end(), S.test.begin(), S.test.end());
  std::sort(S.all_sorted.begin(), S.all_sorted.end(), lessHRT);
  S.all_sorted.erase(std::unique(S.all_sorted.begin(), S.all_sorted.end()), S.all_sorted.end());
  printf("The total of test triples is %lld.\n", (long long)S.test.size());
}

extern "C" void importTypeFiles() {
  const std::string path = S.in_path + "type_constrain.txt";
  FILE *f = fopen(path.c_str(), "r");
  if (!f) return;
  long long n_rel = 0;
  if (fscanf(f, "%lld", &n_rel) != 1) { fclose(f); return; }
  S.type_heads.assign(S.relation_total, {});
  S.type_tails.assign(S.relation_total, {});
  for (long long k = 0; k < 2 * n_rel; k++) {
    long long r = 0, cnt = 0;
    if (fscanf(f, "%lld %lld", &r, &cnt) != 2) break;
    std::vector<INT> ids(cnt);
    for (long long i = 0; i < cnt; i++) {
      long long e = 0;
      if (fscanf(f, "%lld", &e) != 1) break;
      ids[i] = (INT)e;
    }
    std::sort(ids.begin(), ids.end());
    if (k % 2 == 0) S.type_heads[r] = std::move(ids);
    else S.type_tails[r] = std::move(ids);
  }
  S.has_types = true;
  fclose(f);
}

// ---------------------------------------------------------------------------
// Membership + filtered corruption
// ---------------------------------------------------------------------------
namespace {

bool known_triple(INT h, INT t, INT r) {
  Triple q{h, r, t};
  auto it = std::lower_bound(S.all_sorted.begin(), S.all_sorted.end(), q, lessHRT);
  return it != S.all_sorted.end() && *it == q;
}

// Uniform draw from [0, entity_total) \ {sorted known values in arr[lo, hi)}.
// `get` extracts the candidate entity from a Triple.
template <typename Get>
INT draw_excluding(INT id, INT lo, INT hi, Get get) {
  INT k = hi - lo;
  if (k <= 0) return rand_below(id, S.entity_total);
  if (k >= S.entity_total) return rand_below(id, S.entity_total);
  INT d = rand_below(id, S.entity_total - k);
  // Find how many known values are <= the shifted draw: binary search on
  // value(arr[i]) - (i - lo) <= d.
  INT a = lo, b = hi;  // first index with value - offset > d
  while (a < b) {
    INT m = (a + b) / 2;
    if (get(m) - (m - lo) <= d) a = m + 1;
    else b = m;
  }
  return d + (a - lo);
}

INT corrupt_tail_entity(INT id, INT h, INT r) {
  // new tail for (h, r): skip known tails in the (h, r) run of by_head.
  INT lo = S.head_lo[h], hi = S.head_hi[h];
  // narrow to relation run
  auto first = std::lower_bound(S.by_head.begin() + lo, S.by_head.begin() + hi, Triple{h, r, -1},
                                [](const Triple &a, const Triple &b) {
                                  if (a.h != b.h) return a.h < b.h;
                                  return a.r < b.r;
                                });
  auto last = std::upper_bound(S.by_head.begin() + lo, S.by_head.begin() + hi, Triple{h, r, -1},
                               [](const Triple &a, const Triple &b) {
                                 if (a.h != b.h) return a.h < b.h;
                                 return a.r < b.r;
                               });
  INT flo = (INT)(first - S.by_head.begin());
  INT fhi = (INT)(last - S.by_head.begin());
  return draw_excluding(id, flo, fhi, [&](INT i) { return S.by_head[i].t; });
}

INT corrupt_head_entity(INT id, INT t, INT r) {
  INT lo = S.tail_lo[t], hi = S.tail_hi[t];
  auto cmp = [](const Triple &a, const Triple &b) {
    if (a.t != b.t) return a.t < b.t;
    return a.r < b.r;
  };
  auto first = std::lower_bound(S.by_tail.begin() + lo, S.by_tail.begin() + hi, Triple{-1, r, t}, cmp);
  auto last = std::upper_bound(S.by_tail.begin() + lo, S.by_tail.begin() + hi, Triple{-1, r, t}, cmp);
  INT flo = (INT)(first - S.by_tail.begin());
  INT fhi = (INT)(last - S.by_tail.begin());
  return draw_excluding(id, flo, fhi, [&](INT i) { return S.by_tail[i].h; });
}

INT corrupt_rel(INT id, INT h, INT t) {
  INT lo = S.pair_lo[h], hi = S.pair_hi[h];
  auto cmp = [](const Triple &a, const Triple &b) {
    if (a.h != b.h) return a.h < b.h;
    return a.t < b.t;
  };
  auto first = std::lower_bound(S.by_pair.begin() + lo, S.by_pair.begin() + hi, Triple{h, -1, t}, cmp);
  auto last = std::upper_bound(S.by_pair.begin() + lo, S.by_pair.begin() + hi, Triple{h, -1, t}, cmp);
  INT k = (INT)(last - first);
  if (k <= 0 || k >= S.relation_total)
    return rand_below(id, S.relation_total);
  INT d = rand_below(id, S.relation_total - k);
  INT flo = (INT)(first - S.by_pair.begin());
  INT a = flo, b = flo + k;
  while (a < b) {
    INT m = (a + b) / 2;
    if (S.by_pair[m].r - (m - flo) <= d) a = m + 1;
    else b = m;
  }
  return d + (a - flo);
}

}  // namespace

// ---------------------------------------------------------------------------
// sampling — same signature and RNG draw order as Base.cpp:78-197
// ---------------------------------------------------------------------------
extern "C" void sampling(INT *batch_h, INT *batch_t, INT *batch_r, REAL *batch_y,
                         INT batchSize, INT negRate, INT negRelRate, INT mode,
                         bool filter_flag, bool p, bool val_loss) {
  (void)filter_flag;  // corruption is always filtered against train, as upstream
  (void)p;
  auto worker = [&](INT id) {
    INT lo, hi;
    if (batchSize % S.work_threads == 0) {
      lo = id * (batchSize / S.work_threads);
      hi = (id + 1) * (batchSize / S.work_threads);
    } else {
      lo = id * (batchSize / S.work_threads + 1);
      hi = (id + 1) * (batchSize / S.work_threads + 1);
      if (hi > batchSize) hi = batchSize;
    }
    if (val_loss) {
      for (INT b = lo; b < hi && b < (INT)S.valid.size(); b++) {
        batch_h[b] = S.valid[b].h;
        batch_t[b] = S.valid[b].t;
        batch_r[b] = S.valid[b].r;
        batch_y[b] = 1;
      }
      return;
    }
    const INT train_total = (INT)S.train.size();
    for (INT b = lo; b < hi; b++) {
      INT i = rand_below(id, train_total);
      const Triple &x = S.train[i];
      batch_h[b] = x.h;
      batch_t[b] = x.t;
      batch_r[b] = x.r;
      batch_y[b] = 1;
      INT last = batchSize;
      for (INT times = 0; times < negRate; times++) {
        if (mode == 0) {
          REAL prob = 500;
          if (S.bern_flag)
            prob = 1000 * S.right_mean[x.r] / (S.right_mean[x.r] + S.left_mean[x.r]);
          if ((REAL)(next_rand(id) % 1000) < prob) {
            batch_h[b + last] = x.h;
            batch_t[b + last] = corrupt_tail_entity(id, x.h, x.r);
            batch_r[b + last] = x.r;
          } else {
            batch_h[b + last] = corrupt_head_entity(id, x.t, x.r);
            batch_t[b + last] = x.t;
            batch_r[b + last] = x.r;
          }
        } else if (mode == -1) {
          batch_h[b + last] = corrupt_head_entity(id, x.t, x.r);
          batch_t[b + last] = x.t;
          batch_r[b + last] = x.r;
        } else {
          batch_h[b + last] = x.h;
          batch_t[b + last] = corrupt_tail_entity(id, x.h, x.r);
          batch_r[b + last] = x.r;
        }
        batch_y[b + last] = -1;
        last += batchSize;
      }
      for (INT times = 0; times < negRelRate; times++) {
        batch_h[b + last] = x.h;
        batch_t[b + last] = x.t;
        batch_r[b + last] = corrupt_rel(id, x.h, x.t);
        batch_y[b + last] = -1;
        last += batchSize;
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(S.work_threads);
  for (INT id = 0; id < S.work_threads; id++) threads.emplace_back(worker, id);
  for (auto &t : threads) t.join();
}

// ---------------------------------------------------------------------------
// Link prediction (Test.h parity)
// ---------------------------------------------------------------------------
namespace {

struct RankAccum {
  double rank = 0, reci = 0, h1 = 0, h3 = 0, h10 = 0;
  void add(INT worse) {  // worse = #candidates strictly better than gt
    rank += worse + 1;
    reci += 1.0 / (worse + 1);
    if (worse < 1) h1 += 1;
    if (worse < 3) h3 += 1;
    if (worse < 10) h10 += 1;
  }
  void norm(double n) { rank /= n; reci /= n; h1 /= n; h3 /= n; h10 /= n; }
};

RankAccum l_raw, l_filter, r_raw, r_filter, l_cons, r_cons;
INT next_head = 0, next_tail = 0;
double g_mrr, g_mr, g_h10, g_h3, g_h1;

}  // namespace

extern "C" void initTest() {
  l_raw = l_filter = r_raw = r_filter = l_cons = r_cons = RankAccum();
  next_head = next_tail = 0;
}

extern "C" void getHeadBatch(INT *ph, INT *pt, INT *pr) {
  const Triple &x = S.test[next_head];
  for (INT i = 0; i < S.entity_total; i++) { ph[i] = i; pt[i] = x.t; pr[i] = x.r; }
  next_head++;
}

extern "C" void getTailBatch(INT *ph, INT *pt, INT *pr) {
  const Triple &x = S.test[next_tail];
  for (INT i = 0; i < S.entity_total; i++) { ph[i] = x.h; pt[i] = i; pr[i] = x.r; }
  next_tail++;
}

extern "C" void testHead(REAL *scores, INT index, bool type_constrain) {
  const Triple &x = S.test[index];
  REAL gt = scores[x.h];
  INT raw = 0, filt = 0, cons = 0;
  const std::vector<INT> *cand = (type_constrain && S.has_types) ? &S.type_heads[x.r] : nullptr;
  size_t ci = 0;
  for (INT j = 0; j < S.entity_total; j++) {
    if (j == x.h) continue;
    bool better = scores[j] < gt;
    if (better) {
      raw++;
      if (!known_triple(j, x.t, x.r)) filt++;
    }
    if (cand) {
      while (ci < cand->size() && (*cand)[ci] < j) ci++;
      if (ci < cand->size() && (*cand)[ci] == j && better && !known_triple(j, x.t, x.r)) cons++;
    }
  }
  l_raw.add(raw);
  l_filter.add(filt);
  if (cand) l_cons.add(cons);
}

extern "C" void testTail(REAL *scores, INT index, bool type_constrain) {
  const Triple &x = S.test[index];
  REAL gt = scores[x.t];
  INT raw = 0, filt = 0, cons = 0;
  const std::vector<INT> *cand = (type_constrain && S.has_types) ? &S.type_tails[x.r] : nullptr;
  size_t ci = 0;
  for (INT j = 0; j < S.entity_total; j++) {
    if (j == x.t) continue;
    bool better = scores[j] < gt;
    if (better) {
      raw++;
      if (!known_triple(x.h, j, x.r)) filt++;
    }
    if (cand) {
      while (ci < cand->size() && (*cand)[ci] < j) ci++;
      if (ci < cand->size() && (*cand)[ci] == j && better && !known_triple(x.h, j, x.r)) cons++;
    }
  }
  r_raw.add(raw);
  r_filter.add(filt);
  if (cand) r_cons.add(cons);
}

extern "C" void test_link_prediction(bool type_constrain) {
  double n = (double)S.test.size();
  RankAccum lr = l_raw, lf = l_filter, rr = r_raw, rf = r_filter;
  lr.norm(n); lf.norm(n); rr.norm(n); rf.norm(n);
  printf("no type constraint results:\n");
  printf("metric:\t\t\t MRR \t\t MR \t\t hit@10 \t hit@3  \t hit@1 \n");
  printf("l(raw):\t\t\t %f \t %f \t %f \t %f \t %f \n", lr.reci, lr.rank, lr.h10, lr.h3, lr.h1);
  printf("r(raw):\t\t\t %f \t %f \t %f \t %f \t %f \n", rr.reci, rr.rank, rr.h10, rr.h3, rr.h1);
  printf("l(filter):\t\t %f \t %f \t %f \t %f \t %f \n", lf.reci, lf.rank, lf.h10, lf.h3, lf.h1);
  printf("r(filter):\t\t %f \t %f \t %f \t %f \t %f \n", rf.reci, rf.rank, rf.h10, rf.h3, rf.h1);
  g_mrr = (lf.reci + rf.reci) / 2;
  g_mr = (lf.rank + rf.rank) / 2;
  g_h10 = (lf.h10 + rf.h10) / 2;
  g_h3 = (lf.h3 + rf.h3) / 2;
  g_h1 = (lf.h1 + rf.h1) / 2;
  if (type_constrain && S.has_types) {
    RankAccum lc = l_cons, rc = r_cons;
    lc.norm(n); rc.norm(n);
    printf("type-constrained(filter): %f %f %f %f %f\n",
           (lc.reci + rc.reci) / 2, (lc.rank + rc.rank) / 2, (lc.h10 + rc.h10) / 2,
           (lc.h3 + rc.h3) / 2, (lc.h1 + rc.h1) / 2);
    g_mrr = (lc.reci + rc.reci) / 2;
    g_mr = (lc.rank + rc.rank) / 2;
    g_h10 = (lc.h10 + rc.h10) / 2;
    g_h3 = (lc.h3 + rc.h3) / 2;
    g_h1 = (lc.h1 + rc.h1) / 2;
  }
}

extern "C" REAL getTestLinkMRR(bool) { return (REAL)g_mrr; }
extern "C" REAL getTestLinkMR(bool) { return (REAL)g_mr; }
extern "C" REAL getTestLinkHit10(bool) { return (REAL)g_h10; }
extern "C" REAL getTestLinkHit3(bool) { return (REAL)g_h3; }
extern "C" REAL getTestLinkHit1(bool) { return (REAL)g_h1; }

// ---------------------------------------------------------------------------
// Triple classification support (Test.h getNegTest/getTestBatch parity)
// ---------------------------------------------------------------------------
extern "C" void getTestBatch(INT *ph, INT *pt, INT *pr, INT *nh, INT *nt, INT *nr) {
  if (g_rand_state.empty()) randReset();
  for (size_t i = 0; i < S.test.size(); i++) {
    const Triple &x = S.test[i];
    ph[i] = x.h; pt[i] = x.t; pr[i] = x.r;
    nr[i] = x.r;
    if (next_rand(0) % 1000 < 500) {
      nh[i] = x.h;
      nt[i] = corrupt_tail_entity(0, x.h, x.r);
    } else {
      nh[i] = corrupt_head_entity(0, x.t, x.r);
      nt[i] = x.t;
    }
  }
}

extern "C" void getValidBatch(INT *ph, INT *pt, INT *pr, INT *nh, INT *nt, INT *nr) {
  if (g_rand_state.empty()) randReset();
  for (size_t i = 0; i < S.valid.size(); i++) {
    const Triple &x = S.valid[i];
    ph[i] = x.h; pt[i] = x.t; pr[i] = x.r;
    nr[i] = x.r;
    if (next_rand(0) % 1000 < 500) {
      nh[i] = x.h;
      nt[i] = corrupt_tail_entity(0, x.h, x.r);
    } else {
      nh[i] = corrupt_head_entity(0, x.t, x.r);
      nt[i] = x.t;
    }
  }
}

int main() {
  importTrainFiles();
  return 0;
}
