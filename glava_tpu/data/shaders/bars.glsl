/* bars module knobs */

/* center line thickness (px) */
#define C_LINE 1
/* bar width (px) */
#define BAR_WIDTH 5
/* gap between bars (px) */
#define BAR_GAP 1
/* outline width (px, 0 disables) */
#define BAR_OUTLINE_WIDTH 1
/* amplitude multiplier */
#define AMPLIFY 300
/* alpha-channel output (needed for "native" transparency) */
#define USE_ALPHA 0
/* gradient transition length (px) */
#define GRADIENT 80
/* bar color; `d` is the pixel distance from the baseline */
#define COLOR @fg:mix(#3366b2, #a0a0b2, clamp(d / GRADIENT, 0, 1))
/* outline color */
#define BAR_OUTLINE @bg:vec4(COLOR.rgb * 1.5, COLOR.a)
/* 0 = inward, 1 = outward */
#define DIRECTION 0
/* swap left/right channels */
#define INVERT 0
/* flip vertically */
#define FLIP 0
/* mirror along Y = X (render on the side of the window) */
#define MIRROR_YX 0
/* force stereo layout even with `setmirror true` */
#define DISABLE_MONO 0
