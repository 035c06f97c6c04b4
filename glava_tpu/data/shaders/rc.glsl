/* glava_tpu entry configuration.
   Same request surface as GLava's rc.glsl; see docs/CONFIG.md. */

/* Visualizer module: bars, radial, graph, wave, circle */
#request mod bars

/* Window hints (presentation metadata for frame sinks) */
#request setfloating  false
#request setdecorated true
#request setfocused   false
#request setmaximized false

/* Opacity mode: "native", "xroot", or "none" */
#request setopacity "native"

/* Average and mirror left/right channels (mono mixdown) */
#request setmirror false

/* GL versions: accepted for config compatibility, unused on TPU */
#request setversion 3 3
#request setshaderversion 330

#request settitle "GLava"

/* Output geometry (x, y, width, height) */
#request setgeometry 0 0 800 600

/* Background color (RGBA hex) */
#request setbg 00000000

/* EWMH type/state hints (presentation metadata) */
#request setxwintype "normal"
// #request addxwinstate "sticky"
// #request addxwinstate "above"
#request setclickthrough false

/* Audio source: "auto", a device/sink name, or a FIFO path */
#request setsource "auto"

/* Swap interval (vsync frames) */
#request setswap 1

/* Interpolate audio frames between updates on high-FPS outputs */
#request setinterpolate false

/* Frame limiter; 0 disables */
#request setframerate 0

/* Suspend rendering while a fullscreen window is focused */
#request setfullscreencheck false

/* Print FPS/UPS once per second */
#request setprintframes true

/* Samples per audio update; hop = samplesize/4 frames.
   At 22050 Hz: 2048 -> 43.0 UPS, 1024 -> 86.1, 512 -> 172.3 */
#request setsamplesize 1024

/* Processing buffer length (spectrum texture size) */
#request setbufsize 4096

/* Capture sample rate */
#request setsamplerate 22050

/* Batched-device FFT + post-FFT effects (TPU path; always fast here,
   kept for config parity with the reference's GPU/CPU split) */
#request setaccelfft true

/* Deprecated knobs, accepted for compatibility */
#request setforcegeometry false
#request setforceraised false
#request setbufscale 1
