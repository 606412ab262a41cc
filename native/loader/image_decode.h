#pragma once
#include <string>
#include <vector>

namespace myslam {

struct DecodedImage {
  int width = 0;
  int height = 0;
  std::vector<float> gray;  // row-major [height*width], values 0..255
};

// Decode PNG (8/16-bit gray/RGB/palette/alpha, non-interlaced) or
// PGM/PPM (P2/P5/P6) to grayscale float32. Returns false on failure.
bool decode_image_file(const std::string& path, DecodedImage* img);

}  // namespace myslam
