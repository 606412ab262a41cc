// Image decoding: PNG (non-interlaced, via zlib) + PGM/PPM to grayscale
// float32. Native replacement for the reference's per-frame
// cv::imread(...IMREAD_UNCHANGED) in the example mains
// (Examples/Monocular/mono_tum.cc:75) — decoding happens in C++ worker
// threads (prefetch.cc) so the Python/JAX host loop never blocks on IO.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

#include "image_decode.h"

namespace myslam {

namespace {

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Undo PNG scanline filters in place; `bpp` = bytes per pixel.
bool unfilter(std::vector<uint8_t>& raw, int height, int stride, int bpp,
              std::vector<uint8_t>& out) {
  out.resize(size_t(height) * stride);
  const uint8_t* src = raw.data();
  for (int y = 0; y < height; ++y) {
    uint8_t filter = *src++;
    uint8_t* cur = out.data() + size_t(y) * stride;
    const uint8_t* up = y ? out.data() + size_t(y - 1) * stride : nullptr;
    for (int x = 0; x < stride; ++x) {
      int a = x >= bpp ? cur[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= bpp) ? up[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      cur[x] = uint8_t(v);
    }
    src += stride;
  }
  return true;
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(in.data());
  zs.avail_in = uInt(in.size());
  out.clear();
  std::vector<uint8_t> buf(1 << 18);
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    zs.next_out = buf.data();
    zs.avail_out = uInt(buf.size());
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out.insert(out.end(), buf.data(),
               buf.data() + (buf.size() - zs.avail_out));
  }
  inflateEnd(&zs);
  return true;
}

// Luma conversion matching the Python path (0.299/0.587/0.114).
inline float luma(float r, float g, float b) {
  return 0.299f * r + 0.587f * g + 0.114f * b;
}

bool decode_png(const std::vector<uint8_t>& file, DecodedImage* img) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (file.size() < 8 || std::memcmp(file.data(), kSig, 8) != 0) return false;
  size_t pos = 8;
  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // RGB triples
  while (pos + 8 <= file.size()) {
    uint32_t len = be32(&file[pos]);
    const char* type = reinterpret_cast<const char*>(&file[pos + 4]);
    const uint8_t* data = &file[pos + 8];
    if (pos + 12 + len > file.size()) return false;
    if (!std::memcmp(type, "IHDR", 4)) {
      width = be32(data);
      height = be32(data + 4);
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
    } else if (!std::memcmp(type, "PLTE", 4)) {
      palette.assign(data, data + len);
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (!width || !height || interlace != 0) return false;
  if (bit_depth != 8 && bit_depth != 16) return false;

  int channels;
  switch (color_type) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // rgb
    case 3: channels = 1; break;  // palette
    case 4: channels = 2; break;  // gray+alpha
    case 6: channels = 4; break;  // rgba
    default: return false;
  }
  int bytes_per_sample = bit_depth / 8;
  int bpp = channels * bytes_per_sample;
  int stride = int(width) * bpp;

  std::vector<uint8_t> raw;
  if (!inflate_all(idat, raw)) return false;
  if (raw.size() < size_t(height) * (stride + 1)) return false;
  std::vector<uint8_t> pix;
  if (!unfilter(raw, int(height), stride, bpp, pix)) return false;

  img->width = int(width);
  img->height = int(height);
  img->gray.resize(size_t(width) * height);
  for (uint32_t y = 0; y < height; ++y) {
    const uint8_t* row = pix.data() + size_t(y) * stride;
    float* out = img->gray.data() + size_t(y) * width;
    for (uint32_t x = 0; x < width; ++x) {
      const uint8_t* p = row + size_t(x) * bpp;
      float v;
      if (color_type == 3) {
        const uint8_t* c = &palette[size_t(p[0]) * 3];
        v = luma(c[0], c[1], c[2]);
      } else if (bit_depth == 16) {
        // 16-bit big-endian; scale to 8-bit range
        auto s16 = [&](int ch) {
          return float((p[2 * ch] << 8) | p[2 * ch + 1]) * (255.0f / 65535.0f);
        };
        v = (channels >= 3) ? luma(s16(0), s16(1), s16(2)) : s16(0);
      } else {
        v = (channels >= 3) ? luma(p[0], p[1], p[2]) : float(p[0]);
      }
      out[x] = v;
    }
  }
  return true;
}

bool decode_pnm(const std::vector<uint8_t>& file, DecodedImage* img) {
  if (file.size() < 2 || file[0] != 'P') return false;
  char magic = char(file[1]);
  if (magic != '2' && magic != '5' && magic != '6') return false;
  size_t pos = 2;
  auto next_token = [&](long* out) -> bool {
    while (pos < file.size()) {
      if (isspace(file[pos])) {
        ++pos;
      } else if (file[pos] == '#') {
        while (pos < file.size() && file[pos] != '\n') ++pos;
      } else {
        break;
      }
    }
    long v = 0;
    bool any = false;
    while (pos < file.size() && isdigit(file[pos])) {
      v = v * 10 + (file[pos] - '0');
      ++pos;
      any = true;
    }
    *out = v;
    return any;
  };
  long w, h, maxv;
  if (!next_token(&w) || !next_token(&h) || !next_token(&maxv)) return false;
  ++pos;  // single whitespace after maxval
  img->width = int(w);
  img->height = int(h);
  img->gray.resize(size_t(w) * h);
  if (magic == '5') {
    if (file.size() < pos + size_t(w) * h) return false;
    for (long i = 0; i < w * h; ++i) img->gray[i] = float(file[pos + i]);
  } else if (magic == '6') {
    if (file.size() < pos + size_t(w) * h * 3) return false;
    for (long i = 0; i < w * h; ++i) {
      const uint8_t* p = &file[pos + i * 3];
      img->gray[i] = luma(p[0], p[1], p[2]);
    }
  } else {  // P2 ascii
    for (long i = 0; i < w * h; ++i) {
      long v;
      if (!next_token(&v)) return false;
      img->gray[i] = float(v);
    }
  }
  return true;
}

}  // namespace

bool decode_image_file(const std::string& path, DecodedImage* img) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(n), 0);
  size_t got = std::fread(buf.data(), 1, size_t(n), f);
  std::fclose(f);
  if (got != size_t(n)) return false;
  if (decode_png(buf, img)) return true;
  return decode_pnm(buf, img);
}

}  // namespace myslam
