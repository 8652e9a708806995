// Native data-path codecs for video_knet_tpu.
//
// The reference's input pipeline leans on compiled decoders from its
// dependencies (mmcv/turbojpeg/cv2 imread, pycocotools RLE — SURVEY.md §2.9).
// This file provides the TPU-framework-native equivalents: a zlib-backed PNG
// decoder (8-bit gray/RGB/RGBA and 16-bit gray — everything the DVPS datasets
// ship) and a fast column-major RLE encoder, exposed over a C ABI for ctypes.
//
// Build: python -m video_knet_tpu.native.build   (g++ -O3 -shared -fPIC -lz)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

struct PngInfo {
  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = 0, channels = 0;
};

// Decompress all IDAT data and undo per-scanline filtering.
bool decode_png_buffer(const uint8_t* data, size_t size, PngInfo* info,
                       std::vector<uint8_t>* out) {
  static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (size < 8 || memcmp(data, magic, 8) != 0) return false;
  size_t pos = 8;
  std::vector<uint8_t> idat;
  while (pos + 8 <= size) {
    uint32_t len = be32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + len > size) return false;
    if (memcmp(type, "IHDR", 4) == 0) {
      info->width = be32(body);
      info->height = be32(body + 4);
      info->bit_depth = body[8];
      info->color_type = body[9];
      if (body[12] != 0) return false;  // interlaced unsupported
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), body, body + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  switch (info->color_type) {
    case 0: info->channels = 1; break;
    case 2: info->channels = 3; break;
    case 4: info->channels = 2; break;
    case 6: info->channels = 4; break;
    default: return false;  // palette unsupported
  }
  if (info->bit_depth != 8 && info->bit_depth != 16) return false;

  const size_t bpp = size_t(info->channels) * (info->bit_depth / 8);
  const size_t stride = bpp * info->width;
  std::vector<uint8_t> raw((stride + 1) * info->height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    return false;
  }

  out->resize(stride * info->height);
  std::vector<uint8_t> prev(stride, 0);
  for (uint32_t y = 0; y < info->height; ++y) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = out->data() + y * stride;
    switch (filter) {
      case 0:
        memcpy(dst, src, stride);
        break;
      case 1:
        for (size_t i = 0; i < stride; ++i)
          dst[i] = src[i] + (i >= bpp ? dst[i - bpp] : 0);
        break;
      case 2:
        for (size_t i = 0; i < stride; ++i) dst[i] = src[i] + prev[i];
        break;
      case 3:
        for (size_t i = 0; i < stride; ++i) {
          int left = i >= bpp ? dst[i - bpp] : 0;
          dst[i] = src[i] + uint8_t((left + prev[i]) >> 1);
        }
        break;
      case 4:
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= bpp ? dst[i - bpp] : 0;
          int b = prev[i];
          int c = i >= bpp ? prev[i - bpp] : 0;
          dst[i] = src[i] + uint8_t(paeth(a, b, c));
        }
        break;
      default:
        return false;
    }
    memcpy(prev.data(), dst, stride);
  }
  return true;
}

}  // namespace

extern "C" {

// Returns 0 on success. Caller first calls with out=nullptr to get dims, then
// allocates h*w*channels*(bit_depth/8) bytes (16-bit values stay big-endian
// per PNG spec; python side byteswaps).
int vknet_png_info(const char* path, int32_t* h, int32_t* w, int32_t* channels,
                   int32_t* bit_depth) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz);
  if (fread(buf.data(), 1, sz, f) != size_t(sz)) {
    fclose(f);
    return 2;
  }
  fclose(f);
  PngInfo info;
  std::vector<uint8_t> out;
  if (!decode_png_buffer(buf.data(), buf.size(), &info, &out)) return 3;
  *h = info.height;
  *w = info.width;
  *channels = info.channels;
  *bit_depth = info.bit_depth;
  return 0;
}

int vknet_png_read(const char* path, uint8_t* out, int64_t out_size) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz);
  if (fread(buf.data(), 1, sz, f) != size_t(sz)) {
    fclose(f);
    return 2;
  }
  fclose(f);
  PngInfo info;
  std::vector<uint8_t> pixels;
  if (!decode_png_buffer(buf.data(), buf.size(), &info, &pixels)) return 3;
  if (int64_t(pixels.size()) != out_size) return 4;
  memcpy(out, pixels.data(), pixels.size());
  return 0;
}

// Column-major RLE: mask is row-major uint8 [h, w]; counts_out must hold
// h*w+1 entries. Returns the number of counts written.
int64_t vknet_rle_encode(const uint8_t* mask, int64_t h, int64_t w,
                         uint32_t* counts_out) {
  int64_t n = 0;
  uint8_t cur = 0;
  uint32_t run = 0;
  for (int64_t x = 0; x < w; ++x) {
    const uint8_t* col = mask + x;
    for (int64_t y = 0; y < h; ++y) {
      uint8_t v = col[y * w] != 0;
      if (v == cur) {
        ++run;
      } else {
        counts_out[n++] = run;
        cur = v;
        run = 1;
      }
    }
  }
  counts_out[n++] = run;
  return n;
}

}  // extern "C"
