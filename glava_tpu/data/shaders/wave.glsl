/* wave module knobs */

/* min/max line thickness (px) */
#define MIN_THICKNESS 1
#define MAX_THICKNESS 6
/* base color (brightened by distance from center) */
#define BASE_COLOR @fg:vec4(0.7, 0.2, 0.45, 1)
/* amplitude multiplier */
#define AMPLIFY 500
/* outline color */
#define OUTLINE @bg:vec4(0.15, 0.15, 0.15, 1)
