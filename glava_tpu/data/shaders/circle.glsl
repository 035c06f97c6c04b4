/* circle module knobs */

/* center radius (px) */
#define C_RADIUS 128
/* line thickness (px) */
#define C_LINE 1.5
/* line color */
#define OUTLINE @fg:#333333
/* amplitude multiplier */
#define AMPLIFY 150
/* rotation (radians) */
#define ROTATE (PI / 2)
/* swap left/right channels */
#define INVERT 0
/* fill between line and center circle */
#define C_FILL 0
/* post-process smoothing pass */
#define C_SMOOTH 1
