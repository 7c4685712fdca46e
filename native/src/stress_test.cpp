// Concurrency stress test for the native runtime — built and run under
// -fsanitize=thread and -fsanitize=address by `make -C native sanitize`
// (scripts/ci.sh).  The reference has no sanitizer coverage at all
// (SURVEY.md section 5: nine hand-managed mutexes, zero tests); the
// lock-free SPSC ring here is exactly the kind of code a data-race bug
// hides in, so it gets a real producer/consumer hammering.
//
// Checks, under racing threads:
//   1. SPSC FIFO integrity: every popped frame's bytes must match the
//      pattern derived from its stamp (no torn reads, no reordering).
//   2. pop_latest coherence: the returned frame must match the returned
//      stamp even while the producer is mid-push.
//   3. gather_latest across several queues, each with its own producer.
//   4. Recorder write/read round-trip (ASAN value: heap bounds + leaks).
//
// Exit code 0 = all checks passed (sanitizers abort on their own findings).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void* ofq_create(std::size_t capacity, std::size_t frame_bytes);
void ofq_destroy(void* q);
int ofq_push(void* q, const std::uint8_t* frame, std::size_t len, double stamp);
int ofq_pop(void* q, std::uint8_t* out, std::size_t len, double* stamp);
long ofq_pop_latest(void* q, std::uint8_t* out, std::size_t len, double* stamp);
std::size_t ofq_size(void* q);
std::uint64_t ofq_dropped(void* q);
long ofq_gather_latest(void** qs, int n, std::uint8_t* batch,
                       std::size_t frame_bytes, double* stamps,
                       std::uint8_t* mask);
void* ofr_open_write(const char* path, int w, int h, int channels);
int ofr_write(void* r, double stamp, const std::uint8_t* frame);
void* ofr_open_read(const char* path, int* w, int* h, int* ch, long* n);
int ofr_read(void* r, long idx, double* stamp, std::uint8_t* out);
void ofr_close(void* r);
}

namespace {

constexpr std::size_t kFrameBytes = 256;
constexpr long kFrames = 200000;

void fill_pattern(std::uint8_t* buf, std::uint64_t seq,
                  std::size_t len = kFrameBytes) {
  for (std::size_t i = 0; i < len; ++i)
    buf[i] = static_cast<std::uint8_t>((seq * 131 + i * 31) & 0xff);
}

bool check_pattern(const std::uint8_t* buf, std::uint64_t seq,
                   std::size_t len = kFrameBytes) {
  for (std::size_t i = 0; i < len; ++i)
    if (buf[i] != static_cast<std::uint8_t>((seq * 131 + i * 31) & 0xff))
      return false;
  return true;
}

int fail(const char* what) {
  std::fprintf(stderr, "STRESS FAIL: %s\n", what);
  return 1;
}

// 1 + 2: one producer spinning frames into a small ring; the consumer
// alternates strict pops and pop_latest drains, validating every frame
// against its stamp.
int test_spsc() {
  void* q = ofq_create(8, kFrameBytes);
  if (!q) return fail("ofq_create");
  std::atomic<bool> done{false};

  std::thread producer([&] {
    std::uint8_t buf[kFrameBytes];
    for (long seq = 0; seq < kFrames; ++seq) {
      fill_pattern(buf, static_cast<std::uint64_t>(seq));
      // spin until accepted or intentionally dropped (full ring exercises
      // the drop counter path under contention)
      if (ofq_push(q, buf, kFrameBytes, static_cast<double>(seq)) == -1 &&
          (seq & 1)) {
        while (ofq_push(q, buf, kFrameBytes, static_cast<double>(seq)) == -1) {
        }
      }
    }
    done.store(true, std::memory_order_release);
  });

  std::uint8_t out[kFrameBytes];
  double stamp = 0.0;
  double last = -1.0;
  long popped = 0;
  int bad = 0;
  while (!done.load(std::memory_order_acquire) || ofq_size(q) > 0) {
    const int mode = static_cast<int>(popped) & 3;
    long r;
    if (mode == 3) {
      r = ofq_pop_latest(q, out, kFrameBytes, &stamp);
    } else {
      r = ofq_pop(q, out, kFrameBytes, &stamp);
    }
    if (r < -1) { bad = 1; break; }
    if (r == -1) continue;
    ++popped;
    if (!check_pattern(out, static_cast<std::uint64_t>(stamp))) { bad = 2; break; }
    if (stamp <= last) { bad = 3; break; }  // strictly monotone stamps
    last = stamp;
  }
  producer.join();
  const std::uint64_t dropped = ofq_dropped(q);
  ofq_destroy(q);
  if (bad == 1) return fail("spsc: size mismatch return");
  if (bad == 2) return fail("spsc: torn/corrupt frame");
  if (bad == 3) return fail("spsc: stamp went backwards");
  if (popped < 1) return fail("spsc: nothing popped");
  std::printf("spsc ok: popped=%ld dropped=%llu\n", popped,
              static_cast<unsigned long long>(dropped));
  return 0;
}

// 3: fleet gather — N queues, N producers, one consumer gathering batches.
int test_gather() {
  constexpr int kN = 4;
  void* qs[kN];
  for (int i = 0; i < kN; ++i) {
    qs[i] = ofq_create(8, kFrameBytes);
    if (!qs[i]) return fail("gather: create");
  }
  std::atomic<bool> stop{false};
  std::vector<std::thread> producers;
  for (int i = 0; i < kN; ++i) {
    producers.emplace_back([&, i] {
      std::uint8_t buf[kFrameBytes];
      long seq = 0;
      while (!stop.load(std::memory_order_acquire)) {
        fill_pattern(buf, static_cast<std::uint64_t>(seq));
        if (ofq_push(qs[i], buf, kFrameBytes, static_cast<double>(seq)) == 0) ++seq;
      }
    });
  }

  std::uint8_t batch[kN * kFrameBytes];
  double stamps[kN];
  std::uint8_t mask[kN];
  int bad = 0;
  for (int iter = 0; iter < 20000 && !bad; ++iter) {
    std::memset(mask, 0xee, sizeof(mask));
    const long r = ofq_gather_latest(qs, kN, batch, kFrameBytes, stamps, mask);
    if (r < -1) { bad = 1; break; }
    for (int i = 0; i < kN; ++i) {
      if (mask[i] == 0) continue;
      if (mask[i] != 1) { bad = 2; break; }
      if (!check_pattern(batch + static_cast<std::size_t>(i) * kFrameBytes,
                         static_cast<std::uint64_t>(stamps[i]))) { bad = 3; break; }
    }
  }
  stop.store(true, std::memory_order_release);
  for (auto& t : producers) t.join();
  for (int i = 0; i < kN; ++i) ofq_destroy(qs[i]);
  if (bad == 1) return fail("gather: bad return");
  if (bad == 2) return fail("gather: bad mask value");
  if (bad == 3) return fail("gather: frame/stamp mismatch");
  std::printf("gather ok\n");
  return 0;
}

// 4: Recorder round trip (single-threaded; ASAN catches bounds/leaks).
int test_recorder() {
  const char* path = "/tmp/of_stress_rec.bin";
  void* w = ofr_open_write(path, 16, 4, 1);
  if (!w) return fail("recorder: open_write");
  std::uint8_t frame[64];
  for (long i = 0; i < 32; ++i) {
    fill_pattern(frame, static_cast<std::uint64_t>(i), sizeof(frame));
    if (ofr_write(w, static_cast<double>(i), frame) != 0)
      return fail("recorder: write");
  }
  ofr_close(w);
  int fw = 0, fh = 0, fc = 0;
  long n = 0;
  void* r = ofr_open_read(path, &fw, &fh, &fc, &n);
  if (!r || fw != 16 || fh != 4 || fc != 1 || n != 32)
    return fail("recorder: open_read/header");
  double stamp = -1.0;
  std::uint8_t out[64];
  for (long i = n - 1; i >= 0; --i) {
    if (ofr_read(r, i, &stamp, out) != 0) return fail("recorder: read");
    if (stamp != static_cast<double>(i)) return fail("recorder: stamp");
    std::uint8_t expect[64];
    fill_pattern(expect, static_cast<std::uint64_t>(i), sizeof(expect));
    if (std::memcmp(out, expect, sizeof(out)) != 0)
      return fail("recorder: bytes");
  }
  ofr_close(r);
  std::remove(path);
  std::printf("recorder ok\n");
  return 0;
}

}  // namespace

int main() {
  if (int r = test_spsc()) return r;
  if (int r = test_gather()) return r;
  if (int r = test_recorder()) return r;
  std::printf("STRESS PASSED\n");
  return 0;
}
