"""Host runtime: capture threads, frame loop, sinks, control surface.

The reference's process anatomy (SURVEY.md section 3): an audio capture
thread producing into a mutex-guarded ring, a render loop consuming
snapshots, and an atomic control API for embedders. Reproduced here
with the render "thread" driving a jitted device program and frames
flowing to pluggable sinks instead of an X11 window.
"""
