/* In-process engine embedding: the Android JNI analog.
 *
 * The reference's Android port runs the EKF inside the host app process
 * (android/EKFMonoSlam/jni/EKFNative.cpp:62-204: loadEKFNativeReference /
 * EKFInit / EKFStep / releaseEKFNativeReference called from Java).  The
 * TPU build's engine is Python/JAX, so the in-process equivalent embeds
 * the CPython runtime in the host process -- exactly as JNI embeds a JVM
 * -- and drives the SlamEngine through the C API below.  No daemon, no
 * socket, no second process (serving/ remains the multi-client option).
 *
 *   void *ekf_embed_create(config_path, output_path);   // EKFNative load
 *   int   ekf_embed_init(h, gray, w, ht);               // EKF::init
 *   int   ekf_embed_step(h, gray, w, ht, pose7);        // EKF::step
 *   int   ekf_embed_state(h, out, max_n);               // state vector
 *   void  ekf_embed_release(h);                         // release
 *
 * pose7 = (r xyz, q wxyz) after the step, read off engine.state --
 * the same fields EKFNative exposes via the State object.
 *
 * Build (see tools/build_native.sh):
 *   gcc -O2 -shared -fPIC ekf_embed.c $(python3-config --includes) \
 *       -o lib/libekfembed.so $(python3-config --ldflags --embed)
 *
 * The embedded interpreter needs the project's environment: call
 * ekf_embed_set_search_path() first (or export PYTHONPATH) with the
 * repo root and site-packages, as any embedding host app would ship its
 * runtime path.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <string.h>

static char g_extra_path[4096];

void ekf_embed_set_search_path(const char *path) {
    strncpy(g_extra_path, path, sizeof(g_extra_path) - 1);
    g_extra_path[sizeof(g_extra_path) - 1] = 0;
}

/* Bootstrap source: defines a host object holding the engine. */
static const char *BOOTSTRAP =
    "import numpy as _np\n"
    "import jax as _jax\n"
    "try:\n"
    "    _jax.config.update('jax_platforms', "
    "__import__('os').environ.get('EKF_EMBED_PLATFORM', 'cpu'))\n"
    "except Exception:\n"
    "    pass\n"
    "from openekfmonoslam_tpu.engine.engine import SlamEngine\n"
    "class _EkfHost:\n"
    "    def __init__(self, config, output):\n"
    "        self.engine = SlamEngine(config, output_path=output or None)\n"
    "    def _frame(self, buf, w, h):\n"
    "        return _np.frombuffer(buf, _np.uint8).reshape(h, w)\n"
    "    def init(self, buf, w, h):\n"
    "        self.engine.init(self._frame(buf, w, h))\n"
    "        return 0\n"
    "    def step(self, buf, w, h):\n"
    "        self.engine.step(self._frame(buf, w, h))\n"
    "        s = self.engine.state\n"
    "        x = _np.asarray(s.x[:7], _np.float64)\n"
    "        return x.tobytes()\n"
    "    def state(self, max_n):\n"
    "        s = self.engine.state\n"
    "        x = _np.asarray(s.x, _np.float64)[:max_n]\n"
    "        return x.tobytes()\n"
    "    def close(self):\n"
    "        self.engine.close()\n";

static int ensure_interp(void) {
    if (Py_IsInitialized()) return 0;
    Py_InitializeEx(0);
    if (g_extra_path[0]) {
        PyObject *sys_path = PySys_GetObject("path"); /* borrowed */
        char *save = NULL;
        char buf[sizeof(g_extra_path)];
        strcpy(buf, g_extra_path);
        for (char *tok = strtok_r(buf, ":", &save); tok;
             tok = strtok_r(NULL, ":", &save)) {
            PyObject *s = PyUnicode_FromString(tok);
            if (s) { PyList_Append(sys_path, s); Py_DECREF(s); }
        }
    }
    return 0;
}

void *ekf_embed_create(const char *config_path, const char *output_path) {
    if (ensure_interp() != 0) return NULL;
    PyObject *main_mod = PyImport_AddModule("__main__"); /* borrowed */
    PyObject *g = PyModule_GetDict(main_mod);            /* borrowed */
    if (!PyDict_GetItemString(g, "_EkfHost")) {
        if (!PyRun_String(BOOTSTRAP, Py_file_input, g, g)) {
            PyErr_Print();
            return NULL;
        }
    }
    PyObject *cls = PyDict_GetItemString(g, "_EkfHost"); /* borrowed */
    PyObject *host = PyObject_CallFunction(
        cls, "ss", config_path, output_path ? output_path : "");
    if (!host) { PyErr_Print(); return NULL; }
    return (void *)host;
}

static int call_with_frame(void *h, const char *method,
                           const unsigned char *gray, int w, int ht,
                           double *pose_out, int pose_n) {
    PyObject *host = (PyObject *)h;
    PyObject *buf = PyBytes_FromStringAndSize((const char *)gray,
                                              (Py_ssize_t)w * ht);
    if (!buf) return -1;
    PyObject *res = PyObject_CallMethod(host, method, "Oii", buf, w, ht);
    Py_DECREF(buf);
    if (!res) { PyErr_Print(); return -1; }
    if (pose_out && PyBytes_Check(res)) {
        Py_ssize_t nb = PyBytes_Size(res);
        int n = (int)(nb / (Py_ssize_t)sizeof(double));
        if (n > pose_n) n = pose_n;
        memcpy(pose_out, PyBytes_AsString(res), n * sizeof(double));
    }
    Py_DECREF(res);
    return 0;
}

int ekf_embed_init(void *h, const unsigned char *gray, int w, int ht) {
    return call_with_frame(h, "init", gray, w, ht, NULL, 0);
}

int ekf_embed_step(void *h, const unsigned char *gray, int w, int ht,
                   double pose7[7]) {
    return call_with_frame(h, "step", gray, w, ht, pose7, 7);
}

int ekf_embed_state(void *h, double *out, int max_n) {
    PyObject *host = (PyObject *)h;
    PyObject *res = PyObject_CallMethod(host, "state", "i", max_n);
    if (!res) { PyErr_Print(); return -1; }
    /* the bootstrap slices to max_n on the Python side, but the caller's
       buffer bound must not depend on that: clamp in C and reject
       non-bytes results before touching the payload */
    if (!PyBytes_Check(res)) { Py_DECREF(res); return -1; }
    const char *buf = PyBytes_AsString(res);
    if (!buf) { Py_DECREF(res); return -1; }
    Py_ssize_t nb = PyBytes_Size(res);
    int n = (int)(nb / (Py_ssize_t)sizeof(double));
    if (n > max_n) n = max_n;
    if (n < 0) n = 0;
    memcpy(out, buf, (size_t)n * sizeof(double));
    Py_DECREF(res);
    return n;
}

void ekf_embed_release(void *h) {
    PyObject *host = (PyObject *)h;
    PyObject *res = PyObject_CallMethod(host, "close", NULL);
    if (res) Py_DECREF(res); else PyErr_Clear();
    Py_DECREF(host);
}
