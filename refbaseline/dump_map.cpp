// Dump the reference's binary map.cereal to text for the ATE comparison
// (baseline harness; uses the reference's own serialization adapters so the
// bytes are interpreted exactly as the reference wrote them).
//
// Output format (stdout):
//   CAMERA <frame_id> <cam_id> <tx> <ty> <tz> <qx> <qy> <qz> <qw>
//   LANDMARK <track_id> <px> <py> <pz> <n_obs> <n_outlier_obs>
//   SUMMARY cameras=<n> landmarks=<n> observations=<n> outlier_obs=<n>
#include <fstream>
#include <iostream>

#include <visnav/common_types.h>

#include <visnav/calibration.h>
#include <visnav/map_utils.h>
#include <visnav/serialization.h>

using namespace visnav;

int main(int argc, char** argv) {
  if (argc < 3) {
    std::cerr << "usage: dump_map <map.cereal> <calib.json>" << std::endl;
    return 1;
  }
  Corners feature_corners;
  Matches feature_matches;
  FeatureTracks feature_tracks;
  FeatureTracks outlier_tracks;
  Cameras cameras;
  Landmarks landmarks;
  load_map_file(argv[1], feature_corners, feature_matches, feature_tracks,
                outlier_tracks, cameras, landmarks);

  Calibration calib_cam;
  {
    std::ifstream os(argv[2], std::ios::binary);
    cereal::JSONInputArchive archive(os);
    archive(calib_cam);
  }

  std::cout.precision(17);
  for (const auto& kv : cameras) {
    const auto& T = kv.second.T_w_c;
    std::cout << "CAMERA " << kv.first.frame_id << " " << kv.first.cam_id
              << " " << T.translation().x() << " " << T.translation().y()
              << " " << T.translation().z() << " " << T.unit_quaternion().x()
              << " " << T.unit_quaternion().y() << " "
              << T.unit_quaternion().z() << " " << T.unit_quaternion().w()
              << std::endl;
  }
  size_t n_obs = 0, n_out = 0;
  for (const auto& kv : landmarks) {
    const Eigen::Vector3d p =
        kv.second.get_p(cameras, calib_cam, feature_corners);
    std::cout << "LANDMARK " << kv.first << " " << p.x() << " " << p.y()
              << " " << p.z() << " " << kv.second.obs.size() << " "
              << kv.second.outlier_obs.size() << std::endl;
    n_obs += kv.second.obs.size();
    n_out += kv.second.outlier_obs.size();
  }
  std::cout << "SUMMARY cameras=" << cameras.size()
            << " landmarks=" << landmarks.size() << " observations=" << n_obs
            << " outlier_obs=" << n_out << std::endl;
  return 0;
}
