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
//   decode_image_batch(paths, n, out, outH, outW, channels, valid, n_threads)
//     - decodes n PNG/JPEG files (detected by magic), center-crops/pads each
//       to (outH, outW) and writes uint8 into out[n, outH, outW, channels].
//       channels=3: RGB (palette/gray/16-bit PNGs expanded like
//       PIL convert("RGB")); channels=1: RAW label values — palette PNGs
//       yield the palette *indices* (the LIP parse-map convention,
//       tryon_dataset.py:481-537 reads them with PIL without conversion),
//       gray PNGs/JPEGs the gray values. valid[i]=1 on success, 0 (zeroed
//       slot) on failure. Decoding runs on a C++ thread pool and never
//       touches the GIL, so Python-side loader threads scale with cores.

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

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

// ------------------------------------------------------------ image decode

// libjpeg error handling: longjmp out instead of exit()
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  std::jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  std::longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file into an interleaved u8 buffer (RGB or grayscale).
// Returns 1 on success; fills (w, h).
int decode_jpeg(FILE* f, int want_channels, std::vector<uint8_t>* pixels,
                int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  cinfo.out_color_space = want_channels == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = static_cast<int>(cinfo.output_width);
  *h = static_cast<int>(cinfo.output_height);
  const int stride = *w * want_channels;
  pixels->resize(static_cast<size_t>(*h) * stride);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() +
                   static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 1;
}

// Decode a PNG file. want_channels == 3: RGB via the libpng simplified API
// (expands palette/gray/16-bit, drops alpha). want_channels == 1: RAW 8-bit
// values — palette indices for colormapped images (label maps), gray levels
// otherwise.
int decode_png_rgb(const char* path, std::vector<uint8_t>* pixels, int* w,
                   int* h) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return 0;
  image.format = PNG_FORMAT_RGB;
  pixels->resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, pixels->data(), 0, nullptr)) {
    png_image_free(&image);
    return 0;
  }
  *w = static_cast<int>(image.width);
  *h = static_cast<int>(image.height);
  return 1;
}

int decode_png_raw8(FILE* f, std::vector<uint8_t>* pixels, int* w, int* h) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (png == nullptr) return 0;
  png_infop info = png_create_info_struct(png);
  if (info == nullptr) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 0;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  const png_byte color = png_get_color_type(png, info);
  if (png_get_bit_depth(png, info) == 16) png_set_strip_16(png);
  if (png_get_bit_depth(png, info) < 8) png_set_packing(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA) {
    // true-color label maps are not expected; reduce to the red channel
    png_set_strip_alpha(png);
  } else if (color == PNG_COLOR_TYPE_GRAY_ALPHA) {
    png_set_strip_alpha(png);
  }
  // PALETTE stays as raw indices (no png_set_palette_to_rgb): these are the
  // LIP class labels.
  png_read_update_info(png, info);
  *w = static_cast<int>(png_get_image_width(png, info));
  *h = static_cast<int>(png_get_image_height(png, info));
  const int in_ch = static_cast<int>(png_get_channels(png, info));
  std::vector<uint8_t> row(static_cast<size_t>(*w) * in_ch);
  pixels->resize(static_cast<size_t>(*w) * *h);
  for (int y = 0; y < *h; ++y) {
    png_read_row(png, row.data(), nullptr);
    uint8_t* dst = pixels->data() + static_cast<size_t>(y) * *w;
    if (in_ch == 1) {
      std::memcpy(dst, row.data(), *w);
    } else {
      for (int x = 0; x < *w; ++x) dst[x] = row[static_cast<size_t>(x) * in_ch];
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  return 1;
}

// Decode one image file (PNG or JPEG by magic) into a (out_h, out_w,
// channels) u8 crop. Returns 1 on success, 0 on failure (slot zeroed).
int decode_one_image(const char* path, uint8_t* out, int out_h, int out_w,
                     int channels) {
  std::memset(out, 0,
              static_cast<size_t>(out_h) * out_w * channels);
  FILE* f = std::fopen(path, "rb");
  if (f == nullptr) return 0;
  uint8_t magic[8] = {0};
  const size_t got = std::fread(magic, 1, 8, f);
  std::rewind(f);
  std::vector<uint8_t> pixels;
  int w = 0, h = 0, ok = 0;
  const bool is_png = got >= 8 && magic[0] == 0x89 && magic[1] == 'P' &&
                      magic[2] == 'N' && magic[3] == 'G';
  const bool is_jpeg = got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8;
  if (is_png) {
    if (channels == 1) {
      ok = decode_png_raw8(f, &pixels, &w, &h);
    } else {
      std::fclose(f);
      f = nullptr;
      ok = decode_png_rgb(path, &pixels, &w, &h);
    }
  } else if (is_jpeg) {
    ok = decode_jpeg(f, channels, &pixels, &w, &h);
  }
  if (f != nullptr) std::fclose(f);
  if (!ok || w <= 0 || h <= 0) return 0;
  center_crop_into(pixels.data(), h, w, out, out_h, out_w, channels);
  return 1;
}

struct DecodeBatchCtx {
  const char** paths;
  uint8_t* out;
  int out_h, out_w, channels;
  int32_t* valid;
};

void decode_body(int i, void* raw) {
  auto* ctx = static_cast<DecodeBatchCtx*>(raw);
  uint8_t* dst = ctx->out + static_cast<size_t>(i) * ctx->out_h * ctx->out_w *
                                ctx->channels;
  ctx->valid[i] = decode_one_image(ctx->paths[i], dst, ctx->out_h, ctx->out_w,
                                   ctx->channels);
}

void parallel_for(int n, int n_threads, void (*body)(int, void*), void* ctx) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  if (n_threads == 1) {
    // inline: spawning a thread costs more than decoding one small file
    for (int i = 0; i < n; ++i) body(i, ctx);
    return;
  }
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

int decode_image_batch(const char** paths, int n, uint8_t* out, int out_h,
                       int out_w, int channels, int32_t* valid,
                       int n_threads) {
  DecodeBatchCtx ctx{paths, out, out_h, out_w, channels, valid};
  parallel_for(n, n_threads, decode_body, &ctx);
  int ok = 0;
  for (int i = 0; i < n; ++i) ok += valid[i];
  return ok;
}

}  // extern "C"
