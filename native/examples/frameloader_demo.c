/* ASAN/functional driver for the native frame loader: exercises the
 * worker threads, the libpng decode path, the recycle watermark, and
 * the failure paths (missing file, out-of-range index, short buffer).
 *
 *   frameloader_demo <png> [<png> ...]
 *
 * Exits 0 when every existing frame decodes and every failure path
 * returns 0 cleanly.  Built by tools/build_native.sh; run under ASAN by
 * tools/run_asan.sh. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#ifdef __cplusplus
extern "C" {
#endif
void *frameloader_create(const char *joined_paths, int n_paths,
                         int n_threads, int window);
long frameloader_get(void *handle, int i, unsigned char *dst,
                     long dst_bytes, int *w, int *h);
int frameloader_count(void *handle);
void frameloader_destroy(void *handle);
#ifdef __cplusplus
}
#endif

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s <png> [<png> ...]\n", argv[0]);
        return 2;
    }
    int n = argc - 1;
    /* NUL-joined path list, plus one bogus path to hit the decode-failure
     * branch */
    size_t total = 32;
    for (int i = 1; i < argc; i++) total += strlen(argv[i]) + 1;
    char *joined = (char *)malloc(total);
    char *p = joined;
    for (int i = 1; i < argc; i++) {
        strcpy(p, argv[i]);
        p += strlen(argv[i]) + 1;
    }
    strcpy(p, "/nonexistent/frame.png");
    void *L = frameloader_create(joined, n + 1, 3, 4);
    free(joined);
    if (frameloader_count(L) != n + 1) {
        fprintf(stderr, "count mismatch\n");
        return 1;
    }
    long cap = 4L * 1024 * 1024;
    unsigned char *buf = (unsigned char *)malloc(cap);
    for (int i = 0; i < n; i++) {
        int w = 0, h = 0;
        long got = frameloader_get(L, i, buf, cap, &w, &h);
        if (got <= 0 || got != (long)w * h) {
            fprintf(stderr, "frame %d failed (got %ld, %dx%d)\n",
                    i, got, w, h);
            return 1;
        }
    }
    int w, h;
    if (frameloader_get(L, n, buf, cap, &w, &h) != 0) {     /* missing */
        fprintf(stderr, "missing-file path did not fail cleanly\n");
        return 1;
    }
    if (frameloader_get(L, n + 7, buf, cap, &w, &h) != 0) { /* range */
        fprintf(stderr, "out-of-range did not fail cleanly\n");
        return 1;
    }
    if (frameloader_get(L, 0, buf, 16, &w, &h) != 0) {      /* short buf */
        fprintf(stderr, "short buffer did not fail cleanly\n");
        return 1;
    }
    frameloader_destroy(L);
    free(buf);
    printf("frameloader_demo: %d frames OK\n", n);
    return 0;
}
