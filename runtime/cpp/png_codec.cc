// Native PNG codec for the stereo runtime.
//
// Replaces the reference's vendored lodepng (stereo_matching/lodepng.{h,cpp},
// ~8k LoC, used via lodepng::decode/encode at main.cpp:184-186,359) with a
// thin libpng wrapper exposed over a C ABI for ctypes.  Always yields RGBA8,
// matching the reference's CL_RGBA/CL_UNORM_INT8 image uploads.

#include <png.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Decode `path` into a malloc'd RGBA8 buffer (row-major, W*4 stride).
// Returns 0 on success; caller frees *out with stereo_free().
int stereo_png_decode_rgba(const char* path, unsigned char** out,
                           unsigned* width, unsigned* height) {
  *out = nullptr;
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return 2;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(fp);
    return 2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  const png_uint_32 w = png_get_image_width(png, info);
  const png_uint_32 h = png_get_image_height(png, info);
  const int color = png_get_color_type(png, info);
  const int depth = png_get_bit_depth(png, info);

  // Normalise every input to 8-bit RGBA.
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_GRAY ||
      color == PNG_COLOR_TYPE_PALETTE)
    png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  auto* buf = static_cast<unsigned char*>(malloc(size_t(w) * h * 4));
  if (!buf) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 4;
  }
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = buf + size_t(y) * w * 4;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);

  *out = buf;
  *width = w;
  *height = h;
  return 0;
}

// Encode an RGBA8 buffer to `path`. Returns 0 on success.
int stereo_png_encode_rgba(const char* path, const unsigned char* data,
                           unsigned width, unsigned height) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return 1;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return 2;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    fclose(fp);
    return 2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(fp);
    return 3;
  }
  png_init_io(png, fp);
  png_set_IHDR(png, info, width, height, 8, PNG_COLOR_TYPE_RGBA,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_bytep> rows(height);
  for (png_uint_32 y = 0; y < height; ++y)
    rows[y] = const_cast<png_bytep>(data + size_t(y) * width * 4);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  fclose(fp);
  return 0;
}

void stereo_free(void* p) { free(p); }

}  // extern "C"
