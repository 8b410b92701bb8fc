"""TPU-native stereo kernels.

Layout convention: cost volumes are ``[D, H, W]`` (disparity-major) so the
trailing two axes map onto the VPU's (sublane, lane) tiling; images are
``[H, W]`` gray or ``[H, W, 3]`` color, float32 in [0, 255].
"""
