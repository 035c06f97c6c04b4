/* Shared curve macros for drop-in modules.
 *
 * Interface contract with community glava modules (reference:
 * shaders/glava/util/common.glsl) — the macro NAMES, argument lists
 * and math must match because user shaders call them directly and
 * smooth_parameters.glsl selects ROUND_FORMULA from this set. These
 * macros are UNHYGIENIC on purpose: every call site passes raw text,
 * so `window(i, X - 1)` expands the `- 1` as a radian phase shift
 * with denominator X (see ops/windows.py; docs/PARITY.md
 * "Differential parity"). Do not parenthesize the bodies further.
 */
#ifndef _COMMON_GLSL
#define _COMMON_GLSL

#ifndef TWOPI
#define TWOPI 6.28318530718
#endif
#ifndef PI
#define PI 3.14159265359
#endif

/* Hamming-style window over t in [0, sz] */
#define window(t, sz) (0.53836 - (0.46164 * cos(TWOPI * t / sz)))
/* Shallower variants used by module knob files */
#define window_frame(t, sz) (0.6 - (0.4 * cos(TWOPI * t / sz)))
#define window_shallow(t, sz) (0.7 - (0.3 * cos(TWOPI * t / sz)))

/* ROUND_FORMULA options: identity, sine ease, quarter-circle */
#define linear(x) (x)
#define sinusoidal(x) ((0.5 * sin((PI * (x)) - (PI / 2))) + 0.5)
#define circular(x) sqrt(1 - (((x) - 1) * ((x) - 1)))

#endif
