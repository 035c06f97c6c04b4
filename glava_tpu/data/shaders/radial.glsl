/* radial module knobs */

/* center circle radius (px) */
#define C_RADIUS 128
/* center line thickness (px) */
#define C_LINE 2
/* center outline color */
#define OUTLINE @bg:#333333
/* number of bars (even values recommended) */
#define NBARS 160
/* bar width (px) */
#define BAR_WIDTH 4.5
/* amplitude multiplier */
#define AMPLIFY 300
/* gradient transition length (px) */
#define GRADIENT 95
/* bar color; `d` is the distance past the center circle */
#define COLOR @fg:mix(#cc3333, #cca0a0, clamp(d / GRADIENT, 0, 1))
/* rotation (radians) */
#define ROTATE (PI / 2)
/* swap left/right channels */
#define INVERT 0
/* anti-aliasing sharpness factors */
#define BAR_ALIAS_FACTOR 1.2
#define C_ALIAS_FACTOR 1.8
/* center offset (px) */
#define CENTER_OFFSET_Y 0
#define CENTER_OFFSET_X 0
/* (deprecated) */
#define BAR_OUTLINE OUTLINE
#define BAR_OUTLINE_WIDTH 0
