// spider-tpu native data loader: threaded tar-shard reader.
//
// The reference's input pipeline leans on native code in its dependencies
// (decord video decode, torch DataLoader worker processes, webdataset tar
// streaming). Here the IO hot path — walking tar shards, grouping members
// into webdataset-style samples, keeping a prefetch queue full — runs in
// C++ worker threads that never touch the GIL; Python pulls complete samples
// through a small ctypes ABI and does the (numpy/XLA) decode.
//
// ABI (C, stable):
//   void* tr_open(const char** shards, int n_shards, int n_threads,
//                 int queue_capacity, int loop);
//   int   tr_next(void* h, TrMember* out_members, int max_members);
//         -> number of members in the next sample, 0 = end, -1 = error.
//            Member data pointers stay valid until the following tr_next
//            call on the same handle.
//   void  tr_close(void* h);

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Member {
  std::string ext;
  std::vector<uint8_t> data;
};

struct Sample {
  std::string key;
  std::vector<Member> members;
};

// --- minimal tar walking ---------------------------------------------------

struct TarHeader {
  char name[100];
  char mode[8];
  char uid[8];
  char gid[8];
  char size[12];
  char mtime[12];
  char chksum[8];
  char typeflag;
  char linkname[100];
  char magic[6];
  char version[2];
  char uname[32];
  char gname[32];
  char devmajor[8];
  char devminor[8];
  char prefix[155];
  char pad[12];
};
static_assert(sizeof(TarHeader) == 512, "tar header must be 512 bytes");

// Tar size field: octal, or GNU base-256 (leading byte 0x80) for members
// >= 8 GiB. Returns false on malformed input — a wrong size desyncs the
// whole shard stream into garbage samples, so parse failures must surface
// as errors (tr_next -> -1), never be skipped over.
bool parse_size(const char* p, size_t n, uint64_t* out) {
  if (n && (static_cast<unsigned char>(p[0]) & 0x80)) {  // GNU base-256
    uint64_t v = static_cast<unsigned char>(p[0]) & 0x7f;
    for (size_t i = 1; i < n; ++i) {
      if (v > (UINT64_MAX >> 8)) return false;  // overflow
      v = (v << 8) | static_cast<unsigned char>(p[i]);
    }
    *out = v;
    return true;
  }
  uint64_t v = 0;
  size_t i = 0;
  while (i < n && p[i] == ' ') ++i;             // leading spaces (old tars)
  size_t digits = 0;
  for (; i < n && p[i] >= '0' && p[i] <= '7'; ++i, ++digits)
    v = v * 8 + static_cast<uint64_t>(p[i] - '0');
  while (i < n && (p[i] == ' ' || p[i] == '\0')) ++i;  // terminator
  if (i != n || digits == 0) return false;      // junk byte => malformed
  *out = v;
  return true;
}

bool zero_block(const TarHeader& h) {
  const char* p = reinterpret_cast<const char*>(&h);
  for (size_t i = 0; i < sizeof(TarHeader); ++i)
    if (p[i] != 0) return false;
  return true;
}

// --- reader ----------------------------------------------------------------

class TarReader {
 public:
  TarReader(std::vector<std::string> shards, int n_threads, int capacity,
            bool loop)
      : shards_(std::move(shards)),
        capacity_(capacity < 1 ? 1 : capacity),
        loop_(loop) {
    if (n_threads < 1) n_threads = 1;
    // Shards are distributed round-robin over workers; each worker keeps
    // sample grouping local so no cross-thread member mixing can occur.
    for (int t = 0; t < n_threads; ++t)
      workers_.emplace_back([this, t, n_threads] { Work(t, n_threads); });
  }

  ~TarReader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_pop_.notify_all();
    cv_push_.notify_all();
    for (auto& w : workers_) w.join();
  }

  // Returns nullptr at end of (non-looping) data.
  std::unique_ptr<Sample> Next() {
    std::unique_lock<std::mutex> lk(mu_);
    cv_pop_.wait(lk, [this] {
      return !queue_.empty() || (done_workers_ == (int)workers_.size()) ||
             stop_;
    });
    if (queue_.empty()) return nullptr;
    auto s = std::move(queue_.front());
    queue_.pop_front();
    cv_push_.notify_one();
    return s;
  }

 private:
  void Push(std::unique_ptr<Sample> s) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_push_.wait(lk, [this] { return (int)queue_.size() < capacity_ || stop_; });
    if (stop_) return;
    queue_.push_back(std::move(s));
    cv_pop_.notify_one();
  }

  // Parse a PAX extended-header body ("len key=value\n" records) for a
  // path override.
  static bool PaxPath(const std::vector<uint8_t>& body, std::string* out) {
    size_t i = 0;
    while (i < body.size()) {
      size_t sp = i;
      while (sp < body.size() && body[sp] != ' ') ++sp;
      if (sp >= body.size()) return false;
      uint64_t len = 0;
      for (size_t j = i; j < sp; ++j) {
        if (body[j] < '0' || body[j] > '9') return false;
        len = len * 10 + (body[j] - '0');
      }
      if (len == 0 || i + len > body.size()) return false;
      // the record string spans (sp+1 .. i+len-2]; a malformed len smaller
      // than its own "len " prefix would underflow the size_t length below
      if (i + len < sp + 2) return false;
      std::string rec(reinterpret_cast<const char*>(&body[sp + 1]),
                      i + len - sp - 2);  // strip trailing '\n'
      if (rec.rfind("path=", 0) == 0) *out = rec.substr(5);
      i += len;
    }
    return true;
  }

  void WalkShard(const std::string& path) {
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) return;
    std::unique_ptr<Sample> current;
    std::string pending_name;  // from GNU 'L' or PAX 'x' records
    TarHeader hdr;
    while (std::fread(&hdr, 1, sizeof(hdr), f) == sizeof(hdr)) {
      if (zero_block(hdr)) break;
      uint64_t size;
      if (!parse_size(hdr.size, sizeof(hdr.size), &size)) {
        error_.store(true);  // desync: surface instead of emitting garbage
        break;
      }
      uint64_t padded = (size + 511) & ~511ull;
      if (hdr.typeflag == 'L' || hdr.typeflag == 'x') {
        // GNU long-name / PAX extended header: the NEXT member's name.
        std::vector<uint8_t> body(size);
        if (std::fread(body.data(), 1, size, f) != size) {
          error_.store(true);
          break;
        }
        std::fseek(f, (long)(padded - size), SEEK_CUR);
        if (hdr.typeflag == 'L') {
          pending_name.assign(reinterpret_cast<char*>(body.data()),
                              strnlen(reinterpret_cast<char*>(body.data()),
                                      body.size()));
        } else if (!PaxPath(body, &pending_name)) {
          error_.store(true);
          break;
        }
        continue;
      }
      if (hdr.typeflag != '0' && hdr.typeflag != '\0') {
        pending_name.clear();
        std::fseek(f, (long)padded, SEEK_CUR);
        continue;
      }
      std::string name = !pending_name.empty()
          ? pending_name
          : std::string(hdr.name, strnlen(hdr.name, sizeof(hdr.name)));
      pending_name.clear();
      auto slash = name.rfind('/');
      std::string base = slash == std::string::npos ? name
                                                    : name.substr(slash + 1);
      auto dot = base.find('.');
      std::string key = dot == std::string::npos ? base : base.substr(0, dot);
      std::string ext = dot == std::string::npos ? "" : base.substr(dot + 1);

      Member m;
      m.ext = ext;
      m.data.resize(size);
      if (std::fread(m.data.data(), 1, size, f) != size) break;
      std::fseek(f, (long)(padded - size), SEEK_CUR);

      if (!current || current->key != key) {
        if (current && !current->members.empty()) Push(std::move(current));
        current = std::make_unique<Sample>();
        current->key = key;
        {
          std::lock_guard<std::mutex> lk(mu_);
          if (stop_) { std::fclose(f); return; }
        }
      }
      current->members.push_back(std::move(m));
    }
    if (current && !current->members.empty()) Push(std::move(current));
    std::fclose(f);
  }

  void Work(int tid, int n_threads) {
    do {
      for (size_t i = tid; i < shards_.size(); i += (size_t)n_threads) {
        {
          std::lock_guard<std::mutex> lk(mu_);
          if (stop_) break;
        }
        WalkShard(shards_[i]);
      }
      std::lock_guard<std::mutex> lk(mu_);
      if (stop_) break;
    } while (loop_);
    {
      std::lock_guard<std::mutex> lk(mu_);
      done_workers_++;
    }
    cv_pop_.notify_all();
  }

  std::vector<std::string> shards_;
  int capacity_;
  bool loop_;

 public:
  bool has_error() const { return error_.load(); }

 private:
  std::atomic<bool> error_{false};
  std::vector<std::thread> workers_;
  std::deque<std::unique_ptr<Sample>> queue_;
  std::mutex mu_;
  std::condition_variable cv_pop_, cv_push_;
  bool stop_ = false;
  int done_workers_ = 0;
};

struct Handle {
  std::unique_ptr<TarReader> reader;
  std::unique_ptr<Sample> live;  // keeps member buffers alive for the caller
};

}  // namespace

extern "C" {

struct TrMember {
  const char* ext;
  const uint8_t* data;
  uint64_t size;
  const char* key;
};

void* tr_open(const char** shards, int n_shards, int n_threads,
              int queue_capacity, int loop) {
  std::vector<std::string> paths;
  for (int i = 0; i < n_shards; ++i) paths.emplace_back(shards[i]);
  auto* h = new Handle();
  h->reader = std::make_unique<TarReader>(std::move(paths), n_threads,
                                          queue_capacity, loop != 0);
  return h;
}

int tr_next(void* handle, TrMember* out, int max_members) {
  auto* h = static_cast<Handle*>(handle);
  h->live = h->reader->Next();
  if (!h->live) return h->reader->has_error() ? -1 : 0;
  int n = 0;
  for (auto& m : h->live->members) {
    if (n >= max_members) break;
    out[n].ext = m.ext.c_str();
    out[n].data = m.data.data();
    out[n].size = m.data.size();
    out[n].key = h->live->key.c_str();
    n++;
  }
  return n;
}

void tr_close(void* handle) { delete static_cast<Handle*>(handle); }

}  // extern "C"
