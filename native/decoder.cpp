// Native data-path: JPEG decode + crop + bilinear resize, multithreaded.
//
// Replaces the reference's torchvision.io.decode_jpeg / PIL decode in the
// input hot loop (SURVEY.md §3.1: host JPEG decode + RandomResizedCrop is the
// input-bound stage of training). Key speedup vs PIL: libjpeg DCT scaling —
// when the crop will be downscaled to a small training resolution, we decode
// the JPEG directly at 1/2, 1/4 or 1/8 scale, skipping most of the IDCT work.
//
// C ABI (ctypes-friendly):
//   vtt_jpeg_size(data, len, &w, &h)              -> 0 on success
//   vtt_decode_crop_resize(...)                    -> single image
//   vtt_decode_crop_resize_batch(...)              -> thread-pool batch
//
// Output is RGB uint8 HWC; normalization to [0,1] happens on device, which
// also shrinks host->device transfers 4x vs float32.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode `data` at the smallest libjpeg scale that still covers
// (needed_w x needed_h) for the crop region. Returns RGB buffer.
bool decode_scaled(const uint8_t* data, size_t len, int min_crop_w, int min_crop_h,
                   int crop_w, int crop_h, std::vector<uint8_t>& out, int& w, int& h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);

  // pick denom in {1,2,4,8}: decoded crop must stay >= the output size
  int denom = 1;
  for (int d = 2; d <= 8; d *= 2) {
    if (crop_w / d >= min_crop_w && crop_h / d >= min_crop_h) denom = d;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  cinfo.out_color_space = JCS_RGB;
  cinfo.dct_method = JDCT_ISLOW;
  jpeg_start_decompress(&cinfo);

  w = cinfo.output_width;
  h = cinfo.output_height;
  out.resize(static_cast<size_t>(w) * h * 3);
  std::vector<uint8_t*> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out.data() + static_cast<size_t>(y) * w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, rows.data() + cinfo.output_scanline,
                        cinfo.output_height - cinfo.output_scanline);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear sample from src (sw x sh RGB) over box [x0,x1)x[y0,y1) to
// (out_w x out_h), optional horizontal flip.
void crop_resize_bilinear(const uint8_t* src, int sw, int sh,
                          double x0, double y0, double bw, double bh,
                          int out_w, int out_h, bool flip, uint8_t* dst) {
  const double sx = bw / out_w;
  const double sy = bh / out_h;
  for (int oy = 0; oy < out_h; ++oy) {
    // align_corners=False convention (matches PIL/torchvision box resize)
    double fy = y0 + (oy + 0.5) * sy - 0.5;
    fy = std::max(0.0, std::min(fy, static_cast<double>(sh - 1)));
    int y0i = static_cast<int>(fy);
    int y1i = std::min(y0i + 1, sh - 1);
    double wy = fy - y0i;
    for (int ox = 0; ox < out_w; ++ox) {
      double fx = x0 + (ox + 0.5) * sx - 0.5;
      fx = std::max(0.0, std::min(fx, static_cast<double>(sw - 1)));
      int x0i = static_cast<int>(fx);
      int x1i = std::min(x0i + 1, sw - 1);
      double wx = fx - x0i;
      int out_x = flip ? (out_w - 1 - ox) : ox;
      uint8_t* d = dst + (static_cast<size_t>(oy) * out_w + out_x) * 3;
      const uint8_t* p00 = src + (static_cast<size_t>(y0i) * sw + x0i) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0i) * sw + x1i) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1i) * sw + x0i) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1i) * sw + x1i) * 3;
      for (int c = 0; c < 3; ++c) {
        double top = p00[c] * (1 - wx) + p01[c] * wx;
        double bot = p10[c] * (1 - wx) + p11[c] * wx;
        double v = top * (1 - wy) + bot * wy;
        d[c] = static_cast<uint8_t>(v + 0.5);
      }
    }
  }
}

}  // namespace

extern "C" {

int vtt_jpeg_size(const uint8_t* data, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode + crop (box in ORIGINAL image coordinates) + bilinear resize to
// (out_w, out_h) RGB uint8. Returns 0 on success.
int vtt_decode_crop_resize(const uint8_t* data, size_t len, int orig_w, int orig_h,
                           int crop_x, int crop_y, int crop_w, int crop_h, int out_w,
                           int out_h, int flip, uint8_t* out) {
  std::vector<uint8_t> buf;
  int w = 0, h = 0;
  if (!decode_scaled(data, len, out_w, out_h, crop_w, crop_h, buf, w, h)) return 1;
  const double ratio_x = static_cast<double>(w) / orig_w;
  const double ratio_y = static_cast<double>(h) / orig_h;
  crop_resize_bilinear(buf.data(), w, h, crop_x * ratio_x, crop_y * ratio_y,
                       crop_w * ratio_x, crop_h * ratio_y, out_w, out_h, flip != 0, out);
  return 0;
}

// Batched, multithreaded. boxes = int32[n,4] (x, y, w, h) in original coords;
// orig_sizes = int32[n,2] (w, h); flips = uint8[n]; out = uint8[n,out_h,out_w,3].
int vtt_decode_crop_resize_batch(int n, const uint8_t** datas, const size_t* lens,
                                 const int* orig_sizes, const int* boxes,
                                 const uint8_t* flips, int out_w, int out_h,
                                 uint8_t* out, int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(out_w) * out_h * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = vtt_decode_crop_resize(
          datas[i], lens[i], orig_sizes[2 * i], orig_sizes[2 * i + 1],
          boxes[4 * i], boxes[4 * i + 1], boxes[4 * i + 2], boxes[4 * i + 3],
          out_w, out_h, flips ? flips[i] : 0, out + stride * i);
      if (rc != 0) failures.fetch_add(1);
    }
  };
  n_threads = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// Batched window-crop + horizontal flip over PRE-DECODED uint8 RGB images
// (the raw-crop shard path, data/raw_shards.py). srcs[i] points at image i's
// (src_h, src_w, 3) buffer; the output window is rows [y0, y0+out_h) x cols
// [x0, x0+out_w). No resize — shards store a fixed canvas and training crops
// a window (the host-side analogue of the reference's RandomCrop after its
// offline resize, data.py:44-52). NumPy's negative-stride uint8x3 copy runs
// ~75x slower than memcpy (measured: 285 ms vs 3.8 ms per 256x176x176x3
// batch) — this loop is the reason the raw loader hits memory bandwidth.
void vtt_crop_flip_batch(int n, const uint8_t** srcs, int src_w, const int* y0,
                         const int* x0, const uint8_t* flips, int out_w,
                         int out_h, uint8_t* out, int n_threads) {
  const size_t src_row = static_cast<size_t>(src_w) * 3;
  const size_t dst_row = static_cast<size_t>(out_w) * 3;
  const size_t dst_img = dst_row * out_h;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      const uint8_t* src = srcs[i] + static_cast<size_t>(y0[i]) * src_row +
                           static_cast<size_t>(x0[i]) * 3;
      uint8_t* dst = out + dst_img * i;
      if (flips && flips[i]) {
        for (int oy = 0; oy < out_h; ++oy) {
          const uint8_t* s = src + static_cast<size_t>(oy) * src_row;
          uint8_t* d = dst + static_cast<size_t>(oy) * dst_row;
          for (int ox = 0; ox < out_w; ++ox) {
            const uint8_t* p = s + static_cast<size_t>(out_w - 1 - ox) * 3;
            d[3 * ox] = p[0];
            d[3 * ox + 1] = p[1];
            d[3 * ox + 2] = p[2];
          }
        }
      } else {
        for (int oy = 0; oy < out_h; ++oy) {
          std::memcpy(dst + static_cast<size_t>(oy) * dst_row,
                      src + static_cast<size_t>(oy) * src_row, dst_row);
        }
      }
    }
  };
  n_threads = std::max(1, std::min(n_threads, n));
  if (n_threads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
