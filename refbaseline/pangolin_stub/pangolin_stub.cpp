// LoadImage for the headless baseline build: decode via OpenCV imgcodecs.
// The EuRoC images are 8-bit grayscale JPEGs, matching what
// pangolin::LoadImage hands the reference (ManagedImage<uint8_t>).
#include <pangolin/stub_core.h>

#include <opencv2/imgcodecs.hpp>

#include <stdexcept>

namespace pangolin {

TypedImage LoadImage(const std::string& filename) {
  cv::Mat m = cv::imread(filename, cv::IMREAD_GRAYSCALE);
  if (m.empty()) {
    throw std::runtime_error("LoadImage failed: " + filename);
  }
  TypedImage img((size_t)m.cols, (size_t)m.rows);
  for (int y = 0; y < m.rows; ++y) {
    std::memcpy(img.RowPtr((size_t)y), m.ptr(y), (size_t)m.cols);
  }
  return img;
}

}  // namespace pangolin
