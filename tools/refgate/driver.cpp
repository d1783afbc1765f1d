// Scene-dump driver for the reference's DoD engine (the estimator oracle).
//
// Compiles UNMODIFIED reference sources (src/math, src/util minus ObjLoader,
// src/dod) from the read-only mount and renders a scene described by a plain
// text dump produced by tools/dump_scene.py, writing the reference's binary
// .raw accumulation format. This sidesteps the reference's conan-only deps
// (clara CLI, CTRE ObjLoader, libpng) while exercising the exact radiance /
// intersect / render code paths of /root/reference/src/dod/Scene.cpp and the
// Camera/sampling math they call.
//
// Dump format (one record per line, '#' comments):
//   p  width height spp maxDepth uSamples vSamples seed maxCpus preview
//   c  eye(3) lookAt(3) up(3) verticalFovDeg focalPoint(3) apertureRadius
//   e  r g b                                  # environment colour
//   m  emission(3) diffuse(3) ior refl cone   # material table entry
//   t  v0(3) v1(3) v2(3) matIndex
//   s  centre(3) radius matIndex
//
// Usage: refdod <scene.dump> <out.raw>

#include "dod/Scene.h"
#include "math/Camera.h"
#include "util/MaterialSpec.h"
#include "util/RenderParams.h"

#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

namespace {

Vec3 readVec(std::istringstream &s) {
  double x, y, z;
  s >> x >> y >> z;
  return Vec3(x, y, z);
}

} // namespace

int main(int argc, char **argv) {
  if (argc != 3) {
    std::cerr << "usage: refdod <scene.dump> <out.raw>\n";
    return 2;
  }
  std::ifstream in(argv[1]);
  if (!in) {
    std::cerr << "unable to open " << argv[1] << "\n";
    return 2;
  }

  dod::Scene scene;
  RenderParams rp;
  std::vector<MaterialSpec> materials;
  double ex{}, ey{}, ez{}, lx{}, ly{}, lz{}, ux{}, uy{1}, uz{};
  double fov = 50.0, fpx{}, fpy{}, fpz{}, aperture{};

  std::string line;
  while (std::getline(in, line)) {
    if (line.empty() || line[0] == '#')
      continue;
    std::istringstream s(line);
    std::string tag;
    s >> tag;
    if (tag == "p") {
      int preview = 0;
      s >> rp.width >> rp.height >> rp.samplesPerPixel >> rp.maxDepth >>
          rp.firstBounceUSamples >> rp.firstBounceVSamples >> rp.seed >>
          rp.maxCpus >> preview;
      rp.preview = preview != 0;
    } else if (tag == "c") {
      s >> ex >> ey >> ez >> lx >> ly >> lz >> ux >> uy >> uz >> fov >> fpx >>
          fpy >> fpz >> aperture;
    } else if (tag == "e") {
      scene.setEnvironmentColour(readVec(s));
    } else if (tag == "m") {
      MaterialSpec m;
      m.emission = readVec(s);
      m.diffuse = readVec(s);
      s >> m.indexOfRefraction >> m.reflectivity >>
          m.reflectionConeAngleRadians;
      materials.push_back(m);
    } else if (tag == "t") {
      Vec3 v0 = readVec(s), v1 = readVec(s), v2 = readVec(s);
      size_t mi;
      s >> mi;
      scene.addTriangle(v0, v1, v2, materials.at(mi));
    } else if (tag == "s") {
      Vec3 centre = readVec(s);
      double r;
      size_t mi;
      s >> r >> mi;
      scene.addSphere(centre, r, materials.at(mi));
    } else {
      std::cerr << "unknown dump tag: " << tag << "\n";
      return 2;
    }
  }

  Camera camera(Vec3(ex, ey, ez), Vec3(lx, ly, lz),
                Vec3(ux, uy, uz).normalised(), rp.width, rp.height, fov);
  camera.setFocus(Vec3(fpx, fpy, fpz), aperture);

  auto output = scene.render(camera, rp, [](ArrayOutput &) {});
  output.save(argv[2]);
  std::cout << "wrote " << argv[2] << " totalSamples=" << output.totalSamples()
            << "\n";
  return 0;
}
