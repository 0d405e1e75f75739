/* In-process embedding demo: the Android-app analog, no daemon.
 *
 * Loads PGM (P5) grayscale frames and drives the engine through
 * libekfembed -- the whole SLAM runtime lives inside THIS process (as
 * the reference's EKFNative.cpp runs the C++ engine inside the Android
 * app).  Usage:
 *
 *   ekf_embed_demo CONFIG.yml FRAMES_DIR N_FRAMES [PYTHONPATH]
 *
 * FRAMES_DIR holds %05d.pgm frames (convert PNGs with
 * tools/png_to_pgm.py or any imaging tool).
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

void ekf_embed_set_search_path(const char *path);
void *ekf_embed_create(const char *config, const char *output);
int ekf_embed_init(void *h, const unsigned char *gray, int w, int ht);
int ekf_embed_step(void *h, const unsigned char *gray, int w, int ht,
                   double pose7[7]);
void ekf_embed_release(void *h);

static unsigned char *read_pgm(const char *path, int *w, int *h) {
    FILE *f = fopen(path, "rb");
    if (!f) return NULL;
    int maxv;
    if (fscanf(f, "P5 %d %d %d", w, h, &maxv) != 3) { fclose(f); return NULL; }
    fgetc(f);
    unsigned char *buf = malloc((size_t)(*w) * (*h));
    size_t got = fread(buf, 1, (size_t)(*w) * (*h), f);
    fclose(f);
    if (got != (size_t)(*w) * (*h)) { free(buf); return NULL; }
    return buf;
}

int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: %s CONFIG FRAMES_DIR N [PYTHONPATH]\n",
                argv[0]);
        return 2;
    }
    if (argc > 4) ekf_embed_set_search_path(argv[4]);

    void *h = ekf_embed_create(argv[1], NULL);
    if (!h) { fprintf(stderr, "engine create failed\n"); return 1; }

    int n = atoi(argv[3]);
    char path[1024];
    double pose[7];
    for (int i = 1; i <= n; i++) {
        snprintf(path, sizeof(path), "%s/%05d.pgm", argv[2], i);
        int w, ht;
        unsigned char *img = read_pgm(path, &w, &ht);
        if (!img) { fprintf(stderr, "bad frame %s\n", path); return 1; }
        int rc = (i == 1) ? ekf_embed_init(h, img, w, ht)
                          : ekf_embed_step(h, img, w, ht, pose);
        free(img);
        if (rc != 0) { fprintf(stderr, "engine error at %d\n", i); return 1; }
        if (i > 1)
            printf("frame %d r=(%.6f %.6f %.6f)\n", i, pose[0], pose[1],
                   pose[2]);
    }
    ekf_embed_release(h);
    printf("in-process run done: %d frames, single process\n", n);
    return 0;
}
