/* Differential-parity oracle against the reference's OWN executable DSP.
 *
 * The reference's transform chain (glava/render.c:660-848: the window
 * macros, ALLOC_ONCE, clamp/min/max helpers and transform_smooth /
 * transform_gravity / transform_average / transform_wrange /
 * transform_fft) is plain C with zero GL dependencies.  The Makefile
 * extracts exactly that span from /root/reference at BUILD time (awk
 * between the `#define window(t, sz)` anchor and the
 * `transform_functions[]` table) into refdsp_extracted.inc — no
 * reference code is stored in this repository, and the build is
 * skipped when the reference tree is absent.
 *
 * This file supplies the minimal environment the extracted span needs
 * (the handful of struct gl_data fields the transforms read, the
 * gl_sampler_data view, and the TWOPI/swap macros defined earlier in
 * render.c) plus a flat C ABI for ctypes so the test suite can drive
 * randomized multi-update sequences through REAL reference code and
 * compare against the JAX chain.  This replaces hand-transcribed
 * oracles as the root of parity trust (tests/test_refdsp_differential.py).
 */

#include <stdlib.h>
#include <stdio.h>
#include <string.h>
#include <stdbool.h>
#include <stddef.h>
#include <math.h>

/* render.c:63-65 environment the extracted span expects */
#define TWOPI 6.28318530718
#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif
#define swap(a, b) do { __auto_type tmp = a; a = b; b = tmp; } while (0)

/* render.c:115-118 */
struct gl_sampler_data {
    float* buf;
    size_t sz;
};

/* Only the fields the extracted transforms read (subset of the full
 * gl_data at render.c:166-207; the code compiles against THIS
 * definition, so field order is free). */
struct gl_data {
    size_t avg_frames;
    bool avg_window;
    float gravity_step, ur, smooth_distance, smooth_ratio,
        fft_scale, fft_cutoff;
};

#include "refdsp_extracted.inc"

/* ------------------------------------------------------------------ */
/* flat C ABI for ctypes                                               */
/* ------------------------------------------------------------------ */

typedef struct {
    struct gl_data d;
    void* grav_udata;  /* transform_gravity's `applied` scratch */
    void* avg_udata;   /* transform_average's history buffer    */
} refdsp_t;

refdsp_t* refdsp_new(size_t avg_frames, int avg_window, float gravity_step,
                     float ur, float smooth_distance, float smooth_ratio,
                     float fft_scale, float fft_cutoff) {
    refdsp_t* h = calloc(1, sizeof(refdsp_t));
    if (!h) return NULL;
    h->d.avg_frames      = avg_frames;
    h->d.avg_window      = avg_window != 0;
    h->d.gravity_step    = gravity_step;
    h->d.ur              = ur;
    h->d.smooth_distance = smooth_distance;
    h->d.smooth_ratio    = smooth_ratio;
    h->d.fft_scale       = fft_scale;
    h->d.fft_cutoff      = fft_cutoff;
    return h;
}

void refdsp_free(refdsp_t* h) {
    if (!h) return;
    free(h->grav_udata);
    free(h->avg_udata);
    free(h);
}

/* gravity_step is scaled by the measured update rate each frame
 * (render.c:728: g = gravity_step * (1/ur)); exposed so tests can
 * stagger the clock mid-sequence. */
void refdsp_set_ur(refdsp_t* h, float ur) { h->d.ur = ur; }

void refdsp_fft(refdsp_t* h, float* buf, size_t sz) {
    struct gl_sampler_data s = { buf, sz };
    transform_fft(&h->d, NULL, &s);
}

void refdsp_gravity(refdsp_t* h, float* buf, size_t sz) {
    struct gl_sampler_data s = { buf, sz };
    transform_gravity(&h->d, &h->grav_udata, &s);
}

void refdsp_average(refdsp_t* h, float* buf, size_t sz) {
    struct gl_sampler_data s = { buf, sz };
    transform_average(&h->d, &h->avg_udata, &s);
}

void refdsp_smooth(refdsp_t* h, float* buf, size_t sz) {
    struct gl_sampler_data s = { buf, sz };
    transform_smooth(&h->d, NULL, &s);
}

void refdsp_wrange(refdsp_t* h, float* buf, size_t sz) {
    struct gl_sampler_data s = { buf, sz };
    transform_wrange(&h->d, NULL, &s);
}

/* One full CPU-path audio update as rd_update dispatches it: fft with
 * implied gravity then average, in that order (render.c:2150-2155). */
void refdsp_update(refdsp_t* h, float* buf, size_t sz) {
    struct gl_sampler_data s = { buf, sz };
    transform_fft(&h->d, NULL, &s);
    transform_gravity(&h->d, &h->grav_udata, &s);
    transform_average(&h->d, &h->avg_udata, &s);
}
