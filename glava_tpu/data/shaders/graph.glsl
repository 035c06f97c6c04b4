/* graph module knobs */

/* vertical scale */
#define VSCALE 300
/* -1 = outwards, 1 = inwards */
#define DIRECTION 1
/* gradient transition length (px) */
#define GRADIENT 75
/* fill color; `pos` is the pixel distance from the baseline */
#define COLOR @fg:mix(#802A2A, #4F4F92, clamp(pos / GRADIENT, 0, 1))
/* draw outline */
#define DRAW_OUTLINE 0
/* draw edge highlight */
#define DRAW_HIGHLIGHT 1
/* anti-alias the graph border */
#define ANTI_ALIAS 0
/* outline color */
#define OUTLINE @bg:#262626
/* join channels in the middle (0 clamps both to zero) */
#define JOIN_CHANNELS 0
/* flip vertically */
#define INVERT 0
