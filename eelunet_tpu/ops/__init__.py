from eelunet_tpu.ops.edge import (
    rgb_to_grayscale,
    gaussian_kernel,
    gaussian_blur,
    sobel_gradients,
    non_max_suppression,
    canny_edge,
    canny_edge_improve,
    hysteresis_thresholding,
    generate_edge_label,
)

__all__ = [
    "rgb_to_grayscale",
    "gaussian_kernel",
    "gaussian_blur",
    "sobel_gradients",
    "non_max_suppression",
    "canny_edge",
    "canny_edge_improve",
    "hysteresis_thresholding",
    "generate_edge_label",
]
