/* Example community-style module: audio-reactive ring with polar
 * spectrum sampling, a struct, a mat2 rotation shade, and an integer
 * hash dither — exercises the drop-in interpreter's GLSL surface the
 * shipped reference modules don't (structs, bit ops, geometric
 * builtins). Drop into ~/.config/glava_tpu/rings/ and run
 * `glava-tpu -m rings`. */
in vec4 gl_FragCoord;

#request uniform "screen" screen
uniform ivec2 screen;

#request uniform "audio_sz" audio_sz
uniform int audio_sz;

#request uniform "audio_l" audio_l
#request transform audio_l "window"
#request transform audio_l "fft"
#request transform audio_l "gravity"
#request transform audio_l "avg"
uniform sampler1D audio_l;

out vec4 fragment;

struct Ring { float radius; float width; vec3 color; };

void main() {
    vec2 c = vec2(float(screen.x) / 2.0, float(screen.y) / 2.0);
    vec2 p = vec2(gl_FragCoord.x, gl_FragCoord.y) - c;
    float d = length(p);
    float theta = atan(p.y, p.x);
    float pos = abs(theta) / 3.14159265;
    float v = smooth_audio(audio_l, audio_sz, pos);

    Ring r = Ring(0.25 * float(screen.y) + 0.5 * float(screen.y) * v,
                  2.0 + 10.0 * v, vec3(0.2, 0.7, 1.0));

    /* ordered dither from an integer coordinate hash */
    int hx = int(gl_FragCoord.x);
    int hy = int(gl_FragCoord.y);
    int h = ((hx << 3) ^ (hy << 1) ^ (hx >> 2)) & 255;
    float dither = float(h) / 255.0 * 0.04;

    float band = abs(d - r.radius);
    float a = band < r.width ? 1.0 - band / r.width : 0.0;
    a = clamp(a + (a > 0.0 ? dither : 0.0), 0.0, 1.0);

    /* directional shade via a rotated normalized direction */
    mat2 rot = mat2(0.8, -0.6, 0.6, 0.8);
    vec2 q = rot * normalize(p + vec2(0.0001, 0.0));
    float g = 0.6 + 0.4 * q.y;

    fragment = vec4(r.color * (a * g), a);
}
