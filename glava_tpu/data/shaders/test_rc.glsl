/* CI golden-frame entry: exercises requests, transforms and the
   multi-stage chain, asserting a constant output color.

   Provenance: the request list intentionally matches the reference CI
   fixture (/root/reference/shaders/glava/test_rc.glsl) verbatim — the
   compatibility contract is that the reference's own test config runs
   unmodified through this framework's loader (see commit 8876359). */
#request mod test
#request setfloating  false
#request setdecorated true
#request setfocused   false
#request setmaximized false
#request setopacity "native"
#request setmirror false
#request setversion 3 3
#request setshaderversion 330
#request settitle "GLava"
#request setgeometry 0 0 640 640
#request setbg 00000000
#request setxwintype "desktop"
#request setclickthrough false
#request setsource "auto"
#request setswap 0
#request setinterpolate true
#request setframerate 0
#request setfullscreencheck false
#request setprintframes true
#request setsamplesize 1024
#request setbufsize 4096
#request setsamplerate 22050
#request setforcegeometry false
#request setforceraised false
#request setbufscale 1
#request settesteval 55000055
