from tpuimage.io.imageio import (
    ensure_dir,
    load_image_rgb,
    load_image_gray,
    save_image,
    resize_long_side_np,
)
