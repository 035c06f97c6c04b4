/* Final-pass alpha premultiply, shared by drop-in modules as their
 * last `N.frag` (reference: shaders/glava/util/premultiply.frag).
 * Disabled entirely when the module's knob file sets
 * _PREMULTIPLY_ALPHA to 0 — the `#error __disablestage` idiom is the
 * reference's stage-disable channel (render/base.py StageDisabled). */

#if _PREMULTIPLY_ALPHA == 0
#error __disablestage
#endif

#request uniform "prev" tex
uniform sampler2D tex;

out vec4 fragment;
in vec4 gl_FragCoord;

void main() {
    fragment = texelFetch(tex, ivec2(gl_FragCoord.x, gl_FragCoord.y), 0);
    fragment.rgb *= fragment.a;
}
