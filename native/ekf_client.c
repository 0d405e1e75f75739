// C client for the TPU MonoSLAM serving daemon. See ekf_client.h.
//
// Wire format (serving/protocol.py, little-endian):
//   request:  u32 magic | u8 opcode | u32 session | u32 len | payload
//   response: u32 magic | u8 status | u32 len | payload

#include "ekf_client.h"

#include <arpa/inet.h>
#include <netdb.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

#define EKF_MAGIC 0x454B4631u
#define OP_CREATE 1
#define OP_INIT 2
#define OP_STEP 3
#define OP_STATE 4
#define OP_RELEASE 5
#define ST_OK 0

struct ekf_client {
    int fd;
    char err[512];
};

static int write_all(int fd, const void *buf, size_t n) {
    const char *p = (const char *)buf;
    while (n) {
        ssize_t k = write(fd, p, n);
        if (k <= 0) return -1;
        p += k;
        n -= (size_t)k;
    }
    return 0;
}

static int read_all(int fd, void *buf, size_t n) {
    char *p = (char *)buf;
    while (n) {
        ssize_t k = read(fd, p, n);
        if (k <= 0) return -1;
        p += k;
        n -= (size_t)k;
    }
    return 0;
}

static void put_u32(uint8_t *p, uint32_t v) {
    p[0] = v & 0xff; p[1] = (v >> 8) & 0xff;
    p[2] = (v >> 16) & 0xff; p[3] = (v >> 24) & 0xff;
}

static uint32_t get_u32(const uint8_t *p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16)
           | ((uint32_t)p[3] << 24);
}

static int send_request(ekf_client *c, uint8_t opcode, uint32_t session,
                        const void *payload, uint32_t len) {
    uint8_t hdr[13];
    put_u32(hdr, EKF_MAGIC);
    hdr[4] = opcode;
    put_u32(hdr + 5, session);
    put_u32(hdr + 9, len);
    if (write_all(c->fd, hdr, sizeof hdr)) return EKF_ECONN;
    if (len && write_all(c->fd, payload, len)) return EKF_ECONN;
    return EKF_OK;
}

// Reads a response; on ST_OK returns payload length and fills *out (caller
// buffer, truncating); on server error stores the message and returns
// EKF_EREMOTE.
static int64_t recv_response(ekf_client *c, void *out, size_t capacity) {
    uint8_t hdr[9];
    if (read_all(c->fd, hdr, sizeof hdr)) return EKF_ECONN;
    if (get_u32(hdr) != EKF_MAGIC) return EKF_EPROTO;
    uint8_t status = hdr[4];
    uint32_t len = get_u32(hdr + 5);
    if (status != ST_OK) {
        uint32_t n = len < sizeof c->err - 1 ? len : sizeof c->err - 1;
        if (read_all(c->fd, c->err, n)) return EKF_ECONN;
        c->err[n] = 0;
        // drain remainder
        for (uint32_t i = n; i < len; ++i) {
            char junk;
            if (read_all(c->fd, &junk, 1)) return EKF_ECONN;
        }
        return EKF_EREMOTE;
    }
    uint32_t keep = (uint32_t)(len < capacity ? len : capacity);
    if (keep && read_all(c->fd, out, keep)) return EKF_ECONN;
    for (uint32_t i = keep; i < len; ++i) {
        char junk;
        if (read_all(c->fd, &junk, 1)) return EKF_ECONN;
    }
    return (int64_t)len;
}

ekf_client *ekf_connect(const char *address) {
    int fd = -1;
    const char *colon = strrchr(address, ':');
    if (colon) {
        char host[256];
        size_t hl = (size_t)(colon - address);
        if (hl >= sizeof host) return NULL;
        memcpy(host, address, hl);
        host[hl] = 0;
        struct addrinfo hints, *res = NULL;
        memset(&hints, 0, sizeof hints);
        hints.ai_family = AF_INET;
        hints.ai_socktype = SOCK_STREAM;
        if (getaddrinfo(host, colon + 1, &hints, &res)) return NULL;
        fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
        if (fd < 0 || connect(fd, res->ai_addr, res->ai_addrlen)) {
            if (fd >= 0) close(fd);
            freeaddrinfo(res);
            return NULL;
        }
        freeaddrinfo(res);
    } else {
        struct sockaddr_un sa;
        memset(&sa, 0, sizeof sa);
        sa.sun_family = AF_UNIX;
        if (strlen(address) >= sizeof sa.sun_path) return NULL;
        strcpy(sa.sun_path, address);
        fd = socket(AF_UNIX, SOCK_STREAM, 0);
        if (fd < 0) return NULL;
        if (connect(fd, (struct sockaddr *)&sa, sizeof sa)) {
            close(fd);
            return NULL;
        }
    }
    ekf_client *c = (ekf_client *)calloc(1, sizeof *c);
    if (!c) {
        close(fd);
        return NULL;
    }
    c->fd = fd;
    return c;
}

void ekf_disconnect(ekf_client *c) {
    if (!c) return;
    close(c->fd);
    free(c);
}

int64_t ekf_create(ekf_client *c, const char *config_path) {
    const char *cfg = config_path ? config_path : "";
    size_t n = strlen(cfg);
    uint8_t *payload = (uint8_t *)malloc(4 + n);
    if (!payload) return EKF_ECONN;
    put_u32(payload, 0);   // reserved (h/w hint unused; config decides)
    memcpy(payload + 4, cfg, n);
    int rc = send_request(c, OP_CREATE, 0, payload, (uint32_t)(4 + n));
    free(payload);
    if (rc) return rc;
    uint8_t sid[4];
    int64_t len = recv_response(c, sid, sizeof sid);
    if (len < 0) return len;
    if (len != 4) return EKF_EPROTO;
    return (int64_t)get_u32(sid);
}

int ekf_init(ekf_client *c, uint32_t session, const uint8_t *gray,
             uint32_t height, uint32_t width) {
    int rc = send_request(c, OP_INIT, session, gray, height * width);
    if (rc) return rc;
    int64_t len = recv_response(c, NULL, 0);
    return len < 0 ? (int)len : EKF_OK;
}

int ekf_step(ekf_client *c, uint32_t session, const uint8_t *gray,
             uint32_t height, uint32_t width, ekf_pose *out) {
    int rc = send_request(c, OP_STEP, session, gray, height * width);
    if (rc) return rc;
    // payload: 10 f64 + 4 u32, packed little-endian (x86/arm LE match)
    uint8_t buf[10 * 8 + 4 * 4];
    int64_t len = recv_response(c, buf, sizeof buf);
    if (len < 0) return (int)len;
    if (len != (int64_t)sizeof buf) return EKF_EPROTO;
    if (out) {
        memcpy(out->r, buf, 3 * 8);
        memcpy(out->q, buf + 3 * 8, 4 * 8);
        memcpy(out->v, buf + 7 * 8, 3 * 8);
        out->matches = get_u32(buf + 80);
        out->li_inliers = get_u32(buf + 84);
        out->hi_inliers = get_u32(buf + 88);
        out->map_size = get_u32(buf + 92);
    }
    return EKF_OK;
}

int64_t ekf_state(ekf_client *c, uint32_t session, double *out,
                  size_t capacity) {
    int rc = send_request(c, OP_STATE, session, NULL, 0);
    if (rc) return rc;
    int64_t len = recv_response(c, out, capacity * 8);
    return len < 0 ? len : len / 8;
}

int ekf_release(ekf_client *c, uint32_t session) {
    int rc = send_request(c, OP_RELEASE, session, NULL, 0);
    if (rc) return rc;
    int64_t len = recv_response(c, NULL, 0);
    return len < 0 ? (int)len : EKF_OK;
}

const char *ekf_last_error(const ekf_client *c) {
    return c ? c->err : "";
}
