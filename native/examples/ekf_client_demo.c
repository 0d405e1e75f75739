// Minimal host-application example for the C embedding API.
//
// Connects to a running serving daemon, creates a session, pushes raw
// grayscale frames (one file of h*w bytes each) and prints the camera
// pose per frame -- the same loop the reference's Android app runs
// through its JNI shim (ImageSequenceActivity.java:131 -> EKF.java:85 ->
// EKFNative.cpp:155).
//
//   ekf_client_demo <socket> <height> <width> <frame.raw>...
//
// Build: tools/build_native.sh (links native/lib/libekfclient.so)

#include <stdio.h>
#include <stdlib.h>

#include "../ekf_client.h"

int main(int argc, char **argv) {
    if (argc < 5) {
        fprintf(stderr,
                "usage: %s <socket> <height> <width> <frame.raw>...\n",
                argv[0]);
        return 2;
    }
    const char *sock = argv[1];
    uint32_t h = (uint32_t)atoi(argv[2]);
    uint32_t w = (uint32_t)atoi(argv[3]);

    ekf_client *c = ekf_connect(sock);
    if (!c) {
        fprintf(stderr, "connect to %s failed\n", sock);
        return 1;
    }
    int64_t sid = ekf_create(c, "");
    if (sid <= 0) {
        fprintf(stderr, "create failed: %s\n", ekf_last_error(c));
        return 1;
    }

    uint8_t *buf = malloc((size_t)h * w);
    for (int i = 4; i < argc; ++i) {
        FILE *f = fopen(argv[i], "rb");
        if (!f || fread(buf, 1, (size_t)h * w, f) != (size_t)h * w) {
            fprintf(stderr, "bad frame file %s\n", argv[i]);
            return 1;
        }
        fclose(f);
        if (i == 4) {
            if (ekf_init(c, (uint32_t)sid, buf, h, w)) {
                fprintf(stderr, "init failed: %s\n", ekf_last_error(c));
                return 1;
            }
            printf("init ok\n");
            continue;
        }
        ekf_pose pose;
        if (ekf_step(c, (uint32_t)sid, buf, h, w, &pose)) {
            fprintf(stderr, "step failed: %s\n", ekf_last_error(c));
            return 1;
        }
        printf("frame %d: r=(%.5f %.5f %.5f) matches=%u inliers=%u+%u "
               "map=%u\n",
               i - 4, pose.r[0], pose.r[1], pose.r[2], pose.matches,
               pose.li_inliers, pose.hi_inliers, pose.map_size);
    }
    free(buf);
    ekf_release(c, (uint32_t)sid);
    ekf_disconnect(c);
    return 0;
}
