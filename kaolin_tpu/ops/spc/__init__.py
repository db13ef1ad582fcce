from kaolin_tpu.ops.spc.uint8 import (  # noqa: F401
    uint8_to_bits, bits_to_uint8, uint8_bits_sum)
from kaolin_tpu.ops.spc.points import (  # noqa: F401
    quantize_points, unbatched_points_to_octree, points_to_morton,
    morton_to_points, points_to_corners, unbatched_interpolate_trilinear,
    coords_to_trilinear, coords_to_trilinear_coeffs, create_dense_spc)
from kaolin_tpu.ops.spc.convolution import (  # noqa: F401
    conv3d, conv_transpose3d, Conv3d, ConvTranspose3d)
from kaolin_tpu.ops.spc.spc import (  # noqa: F401
    scan_octrees, generate_points, to_dense, feature_grids_to_spc,
    unbatched_query, unbatched_get_level_points, unbatched_make_dual,
    unbatched_make_trinkets)
