// Native JPEG decode + resize for the diffmvs_tpu input pipeline.
//
// Replaces PIL's Image.open(...).resize(...) on the eval/train hot path
// (parity target: the reference feeds torch's C++ DataLoader workers,
// /root/reference/train.py:359-362 — this is the tpu-native equivalent:
// a GIL-free thread pool decoding straight into caller-provided numpy
// buffers, no Python object churn, no multiprocessing pickling).
//
// Decode: libjpeg (the system lib PIL itself links), default ISLOW DCT —
// bit-identical pixels to PIL's decoder.
// Resize: a faithful reimplementation of Pillow's Resample.c BILINEAR
// (triangle filter, horizontal-then-vertical u8 passes, fixed-point
// coefficients with PRECISION_BITS = 22) so outputs are bit-comparable
// to the PIL path (tests/test_native_io.py asserts exact equality).
//
// Build: make -C native (g++ -O2 -shared -fPIC -ljpeg).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow Resample.c

struct ErrMgr {
    jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
    ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
    longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG in memory to RGB u8 [h, w, 3]. Returns 0 on success.
int decode_rgb(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
               int* w, int* h) {
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
                 static_cast<unsigned long>(len));
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    *w = static_cast<int>(cinfo.output_width);
    *h = static_cast<int>(cinfo.output_height);
    out->resize(static_cast<size_t>(*w) * *h * 3);
    const size_t stride = static_cast<size_t>(*w) * 3;
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = out->data() + cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

inline uint8_t clip8(int in) {
    if (in >= (255 << kPrecisionBits)) return 255;
    if (in <= 0) return 0;
    return static_cast<uint8_t>(in >> kPrecisionBits);
}

// Pillow precompute_coeffs for the triangle (BILINEAR) filter.
void precompute(int in_size, int out_size, std::vector<int>* bounds,
                std::vector<int32_t>* kk, int* ksize) {
    const double scale = static_cast<double>(in_size) / out_size;
    const double filterscale = std::max(scale, 1.0);
    const double support = 1.0 * filterscale;  // triangle support = 1
    *ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
    bounds->resize(2 * out_size);
    kk->assign(static_cast<size_t>(out_size) * *ksize, 0);
    std::vector<double> k(*ksize);
    for (int xx = 0; xx < out_size; ++xx) {
        const double center = (xx + 0.5) * scale;
        int xmin = static_cast<int>(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = static_cast<int>(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        double ww = 0.0;
        for (int x = 0; x < xmax; ++x) {
            const double arg = (x + xmin - center + 0.5) / filterscale;
            const double v = std::abs(arg) < 1.0 ? 1.0 - std::abs(arg) : 0.0;
            k[x] = v;
            ww += v;
        }
        for (int x = 0; x < xmax; ++x) {
            if (ww != 0.0) k[x] /= ww;
            const double c = k[x] * (1 << kPrecisionBits);
            (*kk)[static_cast<size_t>(xx) * *ksize + x] =
                static_cast<int32_t>(c < 0 ? c - 0.5 : c + 0.5);
        }
        (*bounds)[xx * 2] = xmin;
        (*bounds)[xx * 2 + 1] = xmax;
    }
}

// One resample pass along W (Pillow ResampleHorizontal_8bpc, 3 channels).
void resample_h(const uint8_t* in, int in_w, int h, int out_w,
                uint8_t* out) {
    std::vector<int> bounds;
    std::vector<int32_t> kk;
    int ksize;
    precompute(in_w, out_w, &bounds, &kk, &ksize);
    for (int yy = 0; yy < h; ++yy) {
        const uint8_t* row = in + static_cast<size_t>(yy) * in_w * 3;
        uint8_t* orow = out + static_cast<size_t>(yy) * out_w * 3;
        for (int xx = 0; xx < out_w; ++xx) {
            const int xmin = bounds[xx * 2], xmax = bounds[xx * 2 + 1];
            const int32_t* k = &kk[static_cast<size_t>(xx) * ksize];
            int ss0 = 1 << (kPrecisionBits - 1);
            int ss1 = ss0, ss2 = ss0;
            for (int x = 0; x < xmax; ++x) {
                const uint8_t* p = row + static_cast<size_t>(xmin + x) * 3;
                ss0 += p[0] * k[x];
                ss1 += p[1] * k[x];
                ss2 += p[2] * k[x];
            }
            orow[xx * 3] = clip8(ss0);
            orow[xx * 3 + 1] = clip8(ss1);
            orow[xx * 3 + 2] = clip8(ss2);
        }
    }
}

// One resample pass along H (Pillow ResampleVertical_8bpc), restructured
// tap-outer / column-inner so the inner loop auto-vectorizes (one int32
// accumulator row, contiguous reads).
void resample_v(const uint8_t* in, int w, int in_h, int out_h,
                uint8_t* out) {
    std::vector<int> bounds;
    std::vector<int32_t> kk;
    int ksize;
    precompute(in_h, out_h, &bounds, &kk, &ksize);
    const size_t stride = static_cast<size_t>(w) * 3;
    std::vector<int32_t> acc(stride);
    for (int yy = 0; yy < out_h; ++yy) {
        const int ymin = bounds[yy * 2], ymax = bounds[yy * 2 + 1];
        const int32_t* k = &kk[static_cast<size_t>(yy) * ksize];
        std::fill(acc.begin(), acc.end(), 1 << (kPrecisionBits - 1));
        for (int y = 0; y < ymax; ++y) {
            const uint8_t* row = in + (ymin + y) * stride;
            const int32_t kv = k[y];
            int32_t* a = acc.data();
            for (size_t xx = 0; xx < stride; ++xx) a[xx] += row[xx] * kv;
        }
        uint8_t* orow = out + static_cast<size_t>(yy) * stride;
        for (size_t xx = 0; xx < stride; ++xx) orow[xx] = clip8(acc[xx]);
    }
}

int decode_resize_one(const uint8_t* data, size_t len, int out_w,
                      int out_h, uint8_t* out) {
    std::vector<uint8_t> rgb;
    int w, h;
    if (decode_rgb(data, len, &rgb, &w, &h)) return 1;
    if (w == out_w && h == out_h) {
        std::memcpy(out, rgb.data(), rgb.size());
        return 0;
    }
    // Pillow two-pass order: horizontal, then vertical (u8 between);
    // identity passes are skipped, exactly like Pillow's
    // need_horizontal/need_vertical checks
    if (h == out_h) {
        resample_h(rgb.data(), w, h, out_w, out);
        return 0;
    }
    if (w == out_w) {
        resample_v(rgb.data(), w, h, out_h, out);
        return 0;
    }
    std::vector<uint8_t> mid(static_cast<size_t>(out_w) * h * 3);
    resample_h(rgb.data(), w, h, out_w, mid.data());
    resample_v(mid.data(), out_w, h, out_h, out);
    return 0;
}

}  // namespace

extern "C" {

// Read (width, height) from a JPEG header. Returns 0 on success.
int djpeg_dims(const uint8_t* data, size_t len, int* w, int* h) {
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
                 static_cast<unsigned long>(len));
    jpeg_read_header(&cinfo, TRUE);
    *w = static_cast<int>(cinfo.image_width);
    *h = static_cast<int>(cinfo.image_height);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Decode + PIL-BILINEAR-resize one JPEG into out [out_h, out_w, 3] u8.
int djpeg_decode_resize(const uint8_t* data, size_t len, int out_w,
                        int out_h, uint8_t* out) {
    return decode_resize_one(data, len, out_w, out_h, out);
}

// Threaded batch over n images (arrays of pointers/sizes). Each worker
// thread pulls the next index atomically; runs GIL-free under ctypes.
// Returns the number of failed images (0 = all good).
int djpeg_decode_resize_batch(int n, const uint8_t** datas,
                              const size_t* lens, const int* out_ws,
                              const int* out_hs, uint8_t** outs,
                              int nthreads) {
    if (nthreads < 1) nthreads = 1;
    nthreads = std::min(nthreads, n);
    std::atomic<int> next(0), failed(0);
    auto work = [&]() {
        for (;;) {
            const int i = next.fetch_add(1);
            if (i >= n) return;
            if (decode_resize_one(datas[i], lens[i], out_ws[i], out_hs[i],
                                  outs[i]))
                failed.fetch_add(1);
        }
    };
    if (nthreads == 1) {
        work();
    } else {
        std::vector<std::thread> pool;
        pool.reserve(nthreads);
        for (int t = 0; t < nthreads; ++t) pool.emplace_back(work);
        for (auto& th : pool) th.join();
    }
    return failed.load();
}

}  // extern "C"
