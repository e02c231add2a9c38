// Native host-side data staging for the video pipeline.
//
// The reference's only native code is its CUDA ops (SURVEY §2.9); its host
// data path is pure Python/PIL and is flagged as a training bottleneck
// (tryon_dataset.py:391). Here the compute-side ops are XLA/Pallas, and this
// small C++ library accelerates the remaining host-bound piece: staging the
// raw per-clip annotation payloads (.flo optical flow is the largest:
// 256*192*2*4B = 393 KB per frame per sample) directly into preallocated
// batch buffers, with a thread pool across files and zero Python-object
// overhead per element.
//
// Exposed C API (ctypes-consumed, see shineon_tpu/native/__init__.py):
//   read_flo_batch(paths, n, out, outH, outW, valid, n_threads)
//     - reads n Middlebury .flo files, center-crops/pads each to (outH, outW),
//       writes float32 into out[n, outH, outW, 2]; valid[i] = 1 on success,
//       0 (and zero-filled flow) when the file is missing/corrupt — the
//       reference's zeros fallback (tryon_dataset.py:290-296).
//   center_crop_u8_batch(srcs, n, srcH, srcW, C, out, outH, outW, n_threads)
//     - center-crop/pad a batch of uint8 HWC images into out[n, outH, outW, C].

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float kFloMagic = 202021.25f;

// Copy the center crop of (srcH, srcW) into (outH, outW), zero-padding when
// the source is smaller (torchvision CenterCrop semantics).
template <typename T>
void center_crop_into(const T* src, int src_h, int src_w, T* dst, int dst_h,
                      int dst_w, int channels) {
  std::memset(dst, 0, sizeof(T) * dst_h * dst_w * channels);
  const int y0 = (src_h - dst_h) / 2;
  const int x0 = (src_w - dst_w) / 2;
  const int src_y0 = y0 > 0 ? y0 : 0;
  const int dst_y0 = y0 < 0 ? -y0 : 0;
  const int src_x0 = x0 > 0 ? x0 : 0;
  const int dst_x0 = x0 < 0 ? -x0 : 0;
  int copy_h = dst_h - dst_y0;
  if (src_h - src_y0 < copy_h) copy_h = src_h - src_y0;
  int copy_w = dst_w - dst_x0;
  if (src_w - src_x0 < copy_w) copy_w = src_w - src_x0;
  if (copy_h <= 0 || copy_w <= 0) return;
  for (int row = 0; row < copy_h; ++row) {
    const T* s = src + ((src_y0 + row) * src_w + src_x0) * channels;
    T* d = dst + ((dst_y0 + row) * dst_w + dst_x0) * channels;
    std::memcpy(d, s, sizeof(T) * copy_w * channels);
  }
}

// Read one .flo file into a (out_h, out_w, 2) float buffer. Returns 1 on
// success, 0 on any failure (buffer left zeroed).
int read_one_flo(const char* path, float* out, int out_h, int out_w) {
  std::memset(out, 0, sizeof(float) * out_h * out_w * 2);
  FILE* f = std::fopen(path, "rb");
  if (f == nullptr) return 0;
  float magic = 0.0f;
  int32_t w = 0, h = 0;
  if (std::fread(&magic, 4, 1, f) != 1 || magic != kFloMagic ||
      std::fread(&w, 4, 1, f) != 1 || std::fread(&h, 4, 1, f) != 1 ||
      w <= 0 || h <= 0 || w > 1 << 16 || h > 1 << 16) {
    std::fclose(f);
    return 0;
  }
  std::vector<float> data(static_cast<size_t>(w) * h * 2);
  const size_t want = data.size();
  const size_t got = std::fread(data.data(), 4, want, f);
  std::fclose(f);
  if (got != want) return 0;
  center_crop_into(data.data(), h, w, out, out_h, out_w, 2);
  return 1;
}

void parallel_for(int n, int n_threads, void (*body)(int, void*), void* ctx) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      body(i, ctx);
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

struct FloBatchCtx {
  const char** paths;
  float* out;
  int out_h, out_w;
  int32_t* valid;
};

void flo_body(int i, void* raw) {
  auto* ctx = static_cast<FloBatchCtx*>(raw);
  float* dst = ctx->out + static_cast<size_t>(i) * ctx->out_h * ctx->out_w * 2;
  ctx->valid[i] = read_one_flo(ctx->paths[i], dst, ctx->out_h, ctx->out_w);
}

struct CropBatchCtx {
  const uint8_t** srcs;
  int src_h, src_w, channels;
  uint8_t* out;
  int out_h, out_w;
};

void crop_body(int i, void* raw) {
  auto* ctx = static_cast<CropBatchCtx*>(raw);
  uint8_t* dst = ctx->out + static_cast<size_t>(i) * ctx->out_h * ctx->out_w *
                                ctx->channels;
  center_crop_into(ctx->srcs[i], ctx->src_h, ctx->src_w, dst, ctx->out_h,
                   ctx->out_w, ctx->channels);
}

}  // namespace

extern "C" {

int read_flo_batch(const char** paths, int n, float* out, int out_h, int out_w,
                   int32_t* valid, int n_threads) {
  FloBatchCtx ctx{paths, out, out_h, out_w, valid};
  parallel_for(n, n_threads, flo_body, &ctx);
  int ok = 0;
  for (int i = 0; i < n; ++i) ok += valid[i];
  return ok;
}

int center_crop_u8_batch(const uint8_t** srcs, int n, int src_h, int src_w,
                         int channels, uint8_t* out, int out_h, int out_w,
                         int n_threads) {
  CropBatchCtx ctx{srcs, src_h, src_w, channels, out, out_h, out_w};
  parallel_for(n, n_threads, crop_body, &ctx);
  return n;
}

}  // extern "C"
