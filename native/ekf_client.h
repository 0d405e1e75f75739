// C embedding API for the TPU MonoSLAM engine.
//
// The reference embeds its engine via a JNI shim exposing
// loadEKFNativeReference / EKFInit / EKFStep / releaseEKFNativeReference
// (android/EKFMonoSlam/jni/EKFNative.cpp:62-73), EKFStep pushing a camera
// frame and returning the camera position (EKFNative.cpp:155-204).  This
// header is the TPU build's equivalent for C/C++ host applications: the
// engine runs in the JAX process that owns the TPU (serving/server.py);
// this client library speaks its length-prefixed socket protocol
// (serving/protocol.py) so hosts link a .so exactly as they linked the
// JNI shim.
//
// All functions return 0 on success, negative on error (EKF_E*).

#ifndef OPENEKFMONOSLAM_TPU_EKF_CLIENT_H_
#define OPENEKFMONOSLAM_TPU_EKF_CLIENT_H_

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct ekf_client ekf_client;   // opaque connection

typedef struct ekf_pose {
    double r[3];            // camera position (world)
    double q[4];            // orientation quaternion (w, x, y, z)
    double v[3];            // linear velocity
    uint32_t matches;       // guided matches this frame
    uint32_t li_inliers;    // low-innovation inliers
    uint32_t hi_inliers;    // rescued high-innovation inliers
    uint32_t map_size;      // live landmarks
} ekf_pose;

enum {
    EKF_OK = 0,
    EKF_ECONN = -1,         // connect/io failure
    EKF_EPROTO = -2,        // malformed response
    EKF_EREMOTE = -3,       // server-side error (see ekf_last_error)
};

// Connect to a serving daemon. `address` is a unix socket path, or
// "host:port" for TCP. NULL on failure.
ekf_client *ekf_connect(const char *address);
void ekf_disconnect(ekf_client *c);

// Create an engine session; config_path may be "" to use the server's
// default config. Returns session id > 0, or a negative error.
int64_t ekf_create(ekf_client *c, const char *config_path);

// EKF::init analog: bootstrap the map from the first grayscale frame
// (h*w bytes, row major; dimensions must match the session's camera
// calibration).
int ekf_init(ekf_client *c, uint32_t session, const uint8_t *gray,
             uint32_t height, uint32_t width);

// EKF::step analog: process one frame, return the camera pose.
int ekf_step(ekf_client *c, uint32_t session, const uint8_t *gray,
             uint32_t height, uint32_t width, ekf_pose *out);

// Fetch the full state vector (caller provides capacity; returns the
// number of doubles written, or a negative error).
int64_t ekf_state(ekf_client *c, uint32_t session, double *out,
                  size_t capacity);

// releaseEKFNativeReference analog.
int ekf_release(ekf_client *c, uint32_t session);

// Last server-side error message for this connection (valid until the
// next call).
const char *ekf_last_error(const ekf_client *c);

#ifdef __cplusplus
}
#endif

#endif  // OPENEKFMONOSLAM_TPU_EKF_CLIENT_H_
