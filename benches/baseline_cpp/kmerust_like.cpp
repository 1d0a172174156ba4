// Measured-baseline proxy for the reference binary (VERDICT r1 #3).
//
// Rust/cargo is not available in this image, so the reference
// (suchapalaver/krust `kmerust`, src/run.rs:489-583 hot loop) cannot be
// compiled here. This C++ program reproduces the reference's per-window
// algorithmic shape faithfully so its single-thread throughput can be
// measured on this host:
//
//   faithful mode (like src/run.rs:526-571 via src/kmer.rs:266-398):
//     per window: validate+copy k bytes into a fresh heap allocation
//     (Bytes::copy_from_slice in Kmer::from_sub), LUT pack over k bytes,
//     byte-wise canonical compare vs reverse complement (allocating when
//     the RC wins), then an FxHash open-addressing map update — the same
//     work dashmap's entry().and_modify().or_insert(1) does per window,
//     minus cross-thread shard locking (which only makes it slower).
//
//   rolling mode: the best-known CPU formulation (rolling 2-bit encode,
//     zero allocation, same map) — an upper bound for ANY single-thread
//     CPU implementation of this pipeline, reference or otherwise.
//
// Usage: kmerust_like <k> <fasta> [faithful|rolling]
// Prints: mode, bases, windows, distinct, seconds, bases_per_second.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr uint8_t kInvalid = 0xFF;

struct Lut {
  uint8_t pack[256];
  Lut() {
    memset(pack, kInvalid, sizeof(pack));
    pack['A'] = pack['a'] = 0;
    pack['C'] = pack['c'] = 1;
    pack['G'] = pack['g'] = 2;
    pack['T'] = pack['t'] = 3;
  }
};
const Lut lut;

// FxHash (rustc-hash), the reference's hasher (src/run.rs:489 DashFx).
inline uint64_t fxhash(uint64_t v) {
  const uint64_t kSeed = 0x517cf9d8a9fcb8ffULL;  // FxHasher rotate+mul mix
  uint64_t h = 0;
  h = (((h << 5) | (h >> 59)) ^ v) * kSeed;
  return h;
}

// Open-addressing u64->u64 map, power-of-2 capacity, linear probing —
// the single-threaded equivalent of one dashmap shard.
class Map {
 public:
  explicit Map(size_t cap_pow2) : mask_(cap_pow2 - 1), keys_(cap_pow2, kEmpty),
                                  vals_(cap_pow2, 0) {}
  void add(uint64_t key, uint64_t w) {
    size_t i = fxhash(key) & mask_;
    for (;;) {
      if (keys_[i] == key) { vals_[i] += w; return; }
      if (keys_[i] == kEmpty) { keys_[i] = key; vals_[i] = w; ++size_; return; }
      i = (i + 1) & mask_;
    }
  }
  size_t size() const { return size_; }

 private:
  static constexpr uint64_t kEmpty = ~0ULL;
  size_t mask_;
  size_t size_ = 0;
  std::vector<uint64_t> keys_, vals_;
};

std::vector<std::string> read_fasta(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { perror("open"); exit(1); }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(sz, '\0');
  if (fread(buf.data(), 1, sz, f) != static_cast<size_t>(sz)) { exit(1); }
  fclose(f);
  std::vector<std::string> seqs;
  size_t i = 0;
  while (i < buf.size()) {
    size_t eol = buf.find('\n', i);
    if (eol == std::string::npos) eol = buf.size();
    if (buf[i] == '>') {
      seqs.emplace_back();
    } else if (!seqs.empty()) {
      seqs.back().append(buf, i, eol - i);
    }
    i = eol + 1;
  }
  return seqs;
}

inline uint64_t revcomp(uint64_t v, int k) {
  uint64_t out = 0;
  for (int i = 0; i < k; ++i) {
    out = (out << 2) | (3 - (v & 3));
    v >>= 2;
  }
  return out;
}

// Faithful: the reference's per-window staging incl. the allocation
// (Kmer::from_sub -> pack -> canonical; src/kmer.rs:266-398).
uint64_t count_faithful(const std::vector<std::string>& seqs, int k, Map* map) {
  uint64_t windows = 0;
  for (const auto& seq : seqs) {
    if (seq.size() < static_cast<size_t>(k)) continue;
    size_t end = seq.size() - k + 1;
    for (size_t i = 0; i < end;) {
      // from_sub: validate + copy into a fresh allocation
      char* win = static_cast<char*>(malloc(k));  // Bytes::copy_from_slice
      int bad = -1;
      for (int j = 0; j < k; ++j) {
        uint8_t c = lut.pack[static_cast<uint8_t>(seq[i + j])];
        if (c == kInvalid) { bad = j; break; }
        win[j] = "ACGT"[c];  // uppercase normalization
      }
      if (bad >= 0) { free(win); i += bad + 1; continue; }
      // pack: second LUT pass over the validated bytes
      uint64_t bits = 0;
      for (int j = 0; j < k; ++j) bits = (bits << 2) | lut.pack[(uint8_t)win[j]];
      // canonical: byte-wise compare against the reverse complement,
      // allocating the RC bytes when it wins (src/kmer.rs:348-390)
      uint64_t rc = revcomp(bits, k);
      if (rc < bits) {
        char* rcb = static_cast<char*>(malloc(k));
        for (int j = 0; j < k; ++j) rcb[j] = "ACGT"[(rc >> (2 * (k - 1 - j))) & 3];
        free(rcb);
        bits = rc;
      }
      free(win);
      map->add(bits, 1);
      ++windows;
      ++i;
    }
  }
  return windows;
}

// Rolling: zero-alloc best-case CPU formulation.
uint64_t count_rolling(const std::vector<std::string>& seqs, int k, Map* map) {
  uint64_t windows = 0;
  const uint64_t mask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
  const int rcs = 2 * (k - 1);
  for (const auto& seq : seqs) {
    if (seq.size() < static_cast<size_t>(k)) continue;
    uint64_t fwd = 0, rc = 0;
    int have = 0;
    for (size_t i = 0; i < seq.size(); ++i) {
      uint8_t c = lut.pack[static_cast<uint8_t>(seq[i])];
      if (c == kInvalid) { have = 0; fwd = 0; rc = 0; continue; }
      fwd = ((fwd << 2) | c) & mask;
      rc = (rc >> 2) | (static_cast<uint64_t>(3 - c) << rcs);
      if (++have >= k) {
        map->add(fwd < rc ? fwd : rc, 1);
        ++windows;
      }
    }
  }
  return windows;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s <k> <fasta> [faithful|rolling]\n", argv[0]);
    return 2;
  }
  int k = atoi(argv[1]);
  const char* mode = argc > 3 ? argv[3] : "faithful";
  auto seqs = read_fasta(argv[2]);
  uint64_t bases = 0;
  for (const auto& s : seqs) bases += s.size();

  Map map(1ULL << 26);  // 64M slots: < 50% load for the 16M-distinct bench
  auto t0 = std::chrono::steady_clock::now();
  uint64_t windows = strcmp(mode, "rolling") == 0
                         ? count_rolling(seqs, k, &map)
                         : count_faithful(seqs, k, &map);
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  printf("{\"mode\": \"%s\", \"bases\": %llu, \"windows\": %llu, "
         "\"distinct\": %zu, \"seconds\": %.3f, \"bases_per_second\": %.0f}\n",
         mode, (unsigned long long)bases, (unsigned long long)windows,
         map.size(), secs, bases / secs);
  return 0;
}
