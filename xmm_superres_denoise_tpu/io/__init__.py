from .fits import Header, load_fits, read_bintable, read_hdus, read_image, write_image

__all__ = ["Header", "load_fits", "read_bintable", "read_hdus", "read_image", "write_image"]
