/* Spectrum sampling helpers for drop-in modules.
 *
 * Interface contract with community glava modules (reference:
 * shaders/glava/util/smooth.glsl): every shipped and user module
 * calls `smooth_audio` / `smooth_audio_adj` / `scale_audio` with
 * these exact signatures, and smooth_parameters.glsl configures them
 * through SAMPLE_MODE / ROUND_FORMULA / SAMPLE_* knobs.
 *
 * The interpreter normally REPLACES these bodies with the baked
 * resample operators (ops/smoothing.py — wisdom-selected dense or
 * block-banded matmuls); under GLAVA_TPU_INTERPRET_SMOOTH=1 the GLSL
 * below is executed as written, which is how the differential suite
 * pins the baked operators against this file and against the
 * reference's own copy (tests/test_smooth_glsl_differential.py).
 * Keep the loop semantics byte-for-byte equivalent to the baked
 * operators: inclusive end in average mode, exclusive in
 * maximum/hybrid, weights from the distance-to-middle curve.
 */
#ifndef _SMOOTH_GLSL
#define _SMOOTH_GLSL

#include ":util/common.glsl"

#include "@smooth_parameters.glsl"
#include ":smooth_parameters.glsl"

/* SAMPLE_MODE selectors (smooth_parameters.glsl picks one by name) */
#define average 0
#define maximum 1
#define hybrid 2

/* Log-compressed spectrum position for idx in [0, 1) */
float scale_audio(float idx) {
    return -log((-(SAMPLE_RANGE) * idx) + 1) / (SAMPLE_SCALE);
}

/* Inverse of scale_audio */
float iscale_audio(float idx) {
    return -log((SAMPLE_RANGE) * idx) / (SAMPLE_SCALE);
}

/* _SMOOTH_FACTOR comes from `#request setsmoothfactor` (engine-defined) */

float smooth_audio(in sampler1D tex, int tex_sz, highp float idx) {
    #if _PRE_SMOOTHED_AUDIO < 1
    float
        smin = scale_audio(clamp(idx - _SMOOTH_FACTOR, 0, 1)) * tex_sz,
        smax = scale_audio(clamp(idx + _SMOOTH_FACTOR, 0, 1)) * tex_sz;
    float m = ((smax - smin) / 2.0F), s, w;
    float rm = smin + m;
    #if SAMPLE_MODE == average
    float avg = 0, weight = 0;
    for (s = smin; s <= smax; s += 1.0F) {
        w = ROUND_FORMULA(clamp((m - abs(rm - s)) / m, 0, 1));
        weight += w;
        avg += texelFetch(tex, int(round(s)), 0).r * w;
    }
    avg /= weight;
    return avg;
    #elif SAMPLE_MODE == hybrid
    float vmax = 0, avg = 0, weight = 0, v;
    for (s = smin; s < smax; s += 1.0F) {
        w = ROUND_FORMULA(clamp((m - abs(rm - s)) / m, 0, 1));
        weight += w;
        v = texelFetch(tex, int(round(s)), 0).r * w;
        avg += v;
        if (vmax < v)
            vmax = v;
    }
    return (vmax * (1 - SAMPLE_HYBRID_WEIGHT)) + ((avg / weight) * SAMPLE_HYBRID_WEIGHT);
    #elif SAMPLE_MODE == maximum
    float vmax = 0, v;
    for (s = smin; s < smax; s += 1.0F) {
        w = texelFetch(tex, int(round(s)), 0).r * ROUND_FORMULA(clamp((m - abs(rm - s)) / m, 0, 1));
        if (vmax < w)
            vmax = w;
    }
    return vmax;
    #endif
    #else
    /* presmoothed path: the engine already resampled the texture */
    return texelFetch(tex, int(round(idx * tex_sz)), 0).r;
    #endif
}

/* Three-tap neighborhood average of smooth_audio */
float smooth_audio_adj(in sampler1D tex, int tex_sz, highp float idx, highp float pixel) {
    float
        al = smooth_audio(tex, tex_sz, max(idx - pixel, 0.0F)),
        am = smooth_audio(tex, tex_sz, idx),
        ar = smooth_audio(tex, tex_sz, min(idx + pixel, 1.0F));
    return (al + am + ar) / 3.0F;
}

/* The reference un-defines the curve constants after this header so
 * module code re-defines them on its own terms; user shaders depend
 * on that (e.g. `#ifndef TWOPI` guards after the include). */
#ifdef TWOPI
#undef TWOPI
#endif
#ifdef PI
#undef PI
#endif
#endif /* _SMOOTH_GLSL */
