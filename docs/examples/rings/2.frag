/* Horizontal glow smear over the ring pass using normalized-coord
 * texture() sampling on prev. */
in vec4 gl_FragCoord;

#request uniform "screen" screen
uniform ivec2 screen;

#request uniform "prev" tex
uniform sampler2D tex;

out vec4 fragment;

void main() {
    vec2 uv = vec2(gl_FragCoord.x / float(screen.x),
                   gl_FragCoord.y / float(screen.y));
    vec4 cur = texelFetch(tex, ivec2(gl_FragCoord.x, gl_FragCoord.y), 0);
    vec4 l1 = texture(tex, vec2(uv.x - 1.0 / float(screen.x), uv.y));
    vec4 l2 = texture(tex, vec2(uv.x - 2.0 / float(screen.x), uv.y));
    fragment = max(cur, max(l1 * 0.7, l2 * 0.45));
}
