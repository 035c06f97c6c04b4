/* Shared smoothing parameters (overridable per module / user config). */

/* Weighting curve: circular | sinusoidal | linear */
#define ROUND_FORMULA sinusoidal

/* Sampling mode: average | maximum | hybrid */
#define SAMPLE_MODE average
/* hybrid-mode weight toward the averaged result, in (0, 1) */
#define SAMPLE_HYBRID_WEIGHT 0.65

/* Frequency compression factor (lower = more room for bass) */
#define SAMPLE_SCALE 8

/* Fraction of spectrum sampled (log-like) */
#define SAMPLE_RANGE 0.9

/* Linear boost for higher frequencies */
#request setfftscale 10.2

/* Bass cutoff when scaling frequencies */
#request setfftcutoff 0.3

/* Frames in the averaging window */
#request setavgframes 5

/* Weight the averaging window (smoother animation) */
#request setavgwindow true

/* Gravity: val -= step * (seconds per update) */
#request setgravitystep 4.2

/* Smoothing kernel half-width, normalized [0, 1) */
#request setsmoothfactor 0.025

/* Precompute the smoothing resample once per texture per update */
#request setsmoothpass true
