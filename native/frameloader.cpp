// Native frame loader: multithreaded PNG decode + grayscale + prefetch.
//
// The TPU build's equivalent of the reference's ImageGenerator layer
// (kalmanFilter/modules/ImageGenerator/FileSequenceImageGenerator.cpp) --
// but as a host-side C++ runtime component that overlaps frame decode with
// device compute.  A worker pool decodes %0Nd-numbered PNG frames with
// libpng, converts to 8-bit grayscale (OpenCV luma weights, matching
// io/sources.py to_gray), and parks them in a bounded ring of
// preallocated buffers consumed in order from Python via ctypes
// (openekfmonoslam_tpu/io/native_loader.py).
//
// Build: tools/build_native.sh  (g++ -O3 -shared -fPIC ... -lpng -lz)

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
    std::vector<uint8_t> gray;
    int width = 0;
    int height = 0;
    bool ok = false;
    std::atomic<bool> ready{false};
};

// Decode one PNG file to 8-bit grayscale. Returns false on any error.
bool decode_png_gray(const char* path, std::vector<uint8_t>& out,
                     int* w_out, int* h_out) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return false;

    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) { std::fclose(fp); return false; }
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        std::fclose(fp);
        return false;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        return false;
    }

    png_init_io(png, fp);
    png_read_info(png, info);

    png_uint_32 width = png_get_image_width(png, info);
    png_uint_32 height = png_get_image_height(png, info);
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);

    // normalize to 8-bit RGB or gray
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    png_read_update_info(png, info);

    int channels = png_get_channels(png, info);
    size_t rowbytes = png_get_rowbytes(png, info);

    std::vector<uint8_t> raw(rowbytes * height);
    std::vector<png_bytep> rows(height);
    for (png_uint_32 y = 0; y < height; ++y)
        rows[y] = raw.data() + y * rowbytes;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);

    out.resize(size_t(width) * height);
    if (channels == 1) {
        for (png_uint_32 y = 0; y < height; ++y)
            std::memcpy(out.data() + size_t(y) * width,
                        raw.data() + y * rowbytes, width);
    } else if (channels >= 3) {
        // OpenCV luma: 0.299 R + 0.587 G + 0.114 B, fixed point /2^15
        constexpr int32_t WR = 9798, WG = 19235, WB = 3735;
        for (png_uint_32 y = 0; y < height; ++y) {
            const uint8_t* src = raw.data() + y * rowbytes;
            uint8_t* dst = out.data() + size_t(y) * width;
            for (png_uint_32 x = 0; x < width; ++x) {
                const uint8_t* p = src + size_t(x) * channels;
                dst[x] = uint8_t(
                    (WR * p[0] + WG * p[1] + WB * p[2] + 16384) >> 15);
            }
        }
    } else {
        return false;
    }
    *w_out = int(width);
    *h_out = int(height);
    return true;
}

struct Loader {
    std::vector<std::string> paths;
    std::vector<Frame> frames;
    std::vector<std::thread> workers;
    std::atomic<size_t> next_job{0};
    std::atomic<size_t> consumed{0};
    size_t window = 64;   // max frames decoded ahead of the consumer
    std::mutex mu;
    std::condition_variable cv_ready;
    std::condition_variable cv_space;
    std::atomic<bool> stop{false};

    void worker() {
        for (;;) {
            size_t i = next_job.fetch_add(1);
            if (i >= paths.size() || stop.load()) return;
            {
                // throttle: stay within `window` of the consumer
                std::unique_lock<std::mutex> lk(mu);
                cv_space.wait(lk, [&] {
                    return stop.load() ||
                           i < consumed.load() + window;
                });
                if (stop.load()) return;
            }
            Frame& f = frames[i];
            f.ok = decode_png_gray(paths[i].c_str(), f.gray, &f.width,
                                   &f.height);
            f.ready.store(true);
            cv_ready.notify_all();
        }
    }
};

}  // namespace

extern "C" {

// Create a loader for an explicit NUL-joined path list.
void* frameloader_create(const char* joined_paths, int n_paths,
                         int n_threads, int window) {
    auto* L = new Loader();
    const char* p = joined_paths;
    for (int i = 0; i < n_paths; ++i) {
        L->paths.emplace_back(p);
        p += L->paths.back().size() + 1;
    }
    L->frames = std::vector<Frame>(L->paths.size());
    L->window = window > 0 ? size_t(window) : 64;
    if (n_threads <= 0) n_threads = int(std::thread::hardware_concurrency());
    if (n_threads < 1) n_threads = 1;
    for (int t = 0; t < n_threads; ++t)
        L->workers.emplace_back([L] { L->worker(); });
    return L;
}

// Block until frame i is decoded; copy into dst (capacity dst_bytes).
// Returns 0 on decode failure, else number of bytes written; writes
// width/height through the out params.
long frameloader_get(void* handle, int i, uint8_t* dst, long dst_bytes,
                     int* w, int* h) {
    auto* L = static_cast<Loader*>(handle);
    if (i < 0 || size_t(i) >= L->frames.size()) return 0;
    Frame& f = L->frames[i];
    if (!f.ready.load()) {
        std::unique_lock<std::mutex> lk(L->mu);
        L->cv_ready.wait(lk, [&] { return f.ready.load(); });
    }
    if (!f.ok) return 0;
    long bytes = long(f.gray.size());
    if (bytes > dst_bytes) return 0;
    std::memcpy(dst, f.gray.data(), bytes);
    *w = f.width;
    *h = f.height;
    // advance the consumer watermark and recycle memory
    size_t c = L->consumed.load();
    while (size_t(i) + 1 > c &&
           !L->consumed.compare_exchange_weak(c, size_t(i) + 1)) {}
    f.gray = std::vector<uint8_t>();  // free decoded data after hand-off
    L->cv_space.notify_all();
    return bytes;
}

int frameloader_count(void* handle) {
    return int(static_cast<Loader*>(handle)->paths.size());
}

void frameloader_destroy(void* handle) {
    auto* L = static_cast<Loader*>(handle);
    L->stop.store(true);
    L->next_job.store(L->paths.size());
    L->cv_space.notify_all();
    for (auto& t : L->workers) t.join();
    delete L;
}

}  // extern "C"
