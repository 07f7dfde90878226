// Native URDF parser: XML -> compact JSON robot spec.
//
// The host-runtime counterpart of the reference's C++ model loader
// (dart::utils::DartLoader, reference simulation.py:403-408).  The TPU
// framework keeps model *semantics* (fixed-joint lumping, zero-mass
// fix-up) in one place — cmpc_tpu/rbd/urdf.py:build_model — and this
// library supplies the parsing front-end natively: URDF XML in, the same
// JSON robot-spec format produced by tools/extract_hrp4.py out.
//
// Deliberately dependency-free: URDF files are machine-generated, flat,
// attribute-style XML, so a small recursive tag scanner is sufficient
// (comments and <!...> declarations are handled; CDATA and exotic XML are
// not, matching what robot_description exporters actually emit).
//
// C ABI:
//   int cmpc_parse_urdf(const char* path, char* out, long cap);
//     -> bytes written (JSON), or -1 on open failure, -2 if `cap` too
//        small, -3 on malformed XML.

#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Node {
  std::string tag;
  std::map<std::string, std::string> attrs;
  std::vector<Node> children;
};

// --- minimal XML scanning -------------------------------------------------

void skip_ws(const std::string& s, size_t& i) {
  while (i < s.size() && std::isspace(static_cast<unsigned char>(s[i]))) ++i;
}

bool parse_attrs(const std::string& s, size_t& i, Node& n) {
  for (;;) {
    skip_ws(s, i);
    if (i >= s.size()) return false;
    if (s[i] == '>' || s[i] == '/' || s[i] == '?') return true;
    size_t eq = s.find('=', i);
    if (eq == std::string::npos) return false;
    std::string key = s.substr(i, eq - i);
    while (!key.empty() && std::isspace(static_cast<unsigned char>(key.back())))
      key.pop_back();
    i = eq + 1;
    skip_ws(s, i);
    if (i >= s.size() || (s[i] != '"' && s[i] != '\'')) return false;
    char q = s[i++];
    size_t end = s.find(q, i);
    if (end == std::string::npos) return false;
    n.attrs[key] = s.substr(i, end - i);
    i = end + 1;
  }
}

// parse one element starting at '<'; returns false on malformed input
bool parse_element(const std::string& s, size_t& i, Node& out) {
  for (;;) {  // skip comments / declarations / text
    skip_ws(s, i);
    if (i >= s.size()) return false;
    if (s[i] != '<') { ++i; continue; }
    if (s.compare(i, 4, "<!--") == 0) {
      size_t end = s.find("-->", i);
      if (end == std::string::npos) return false;
      i = end + 3;
    } else if (s.compare(i, 2, "<!") == 0 || s.compare(i, 2, "<?") == 0) {
      size_t end = s.find('>', i);
      if (end == std::string::npos) return false;
      i = end + 1;
    } else {
      break;
    }
  }
  ++i;  // consume '<'
  size_t start = i;
  while (i < s.size() && !std::isspace(static_cast<unsigned char>(s[i])) &&
         s[i] != '>' && s[i] != '/')
    ++i;
  out.tag = s.substr(start, i - start);
  if (!parse_attrs(s, i, out)) return false;
  if (s[i] == '/') {  // self-closing
    i += 2;
    return true;
  }
  ++i;  // consume '>'
  for (;;) {
    // scan to next markup, skipping text
    size_t lt = s.find('<', i);
    if (lt == std::string::npos) return false;
    i = lt;
    if (s.compare(i, 2, "</") == 0) {
      size_t end = s.find('>', i);
      if (end == std::string::npos) return false;
      i = end + 1;
      return true;
    }
    if (s.compare(i, 4, "<!--") == 0) {
      size_t end = s.find("-->", i);
      if (end == std::string::npos) return false;
      i = end + 3;
      continue;
    }
    Node child;
    if (!parse_element(s, i, child)) return false;
    out.children.push_back(std::move(child));
  }
}

const Node* find_child(const Node& n, const char* tag) {
  for (const auto& c : n.children)
    if (c.tag == tag) return &c;
  return nullptr;
}

std::string attr(const Node* n, const char* key, const char* dflt) {
  if (!n) return dflt;
  auto it = n->attrs.find(key);
  return it == n->attrs.end() ? dflt : it->second;
}

std::vector<double> nums(const std::string& s, size_t want) {
  std::vector<double> v;
  std::istringstream is(s);
  double d;
  while (is >> d) v.push_back(d);
  while (v.size() < want) v.push_back(0.0);
  return v;
}

// --- JSON emission ---------------------------------------------------------

void emit_num(std::string& o, double v) {
  if (std::isinf(v)) {
    o += v > 0 ? "1e999" : "-1e999";  // json.loads -> inf
    return;
  }
  char buf[32];
  std::snprintf(buf, sizeof buf, "%.17g", v);
  o += buf;
}

void emit_vec(std::string& o, const std::vector<double>& v) {
  o += '[';
  for (size_t i = 0; i < v.size(); ++i) {
    if (i) o += ',';
    emit_num(o, v[i]);
  }
  o += ']';
}

void emit_str(std::string& o, const std::string& s) {
  o += '"';
  for (char c : s) {
    if (c == '"' || c == '\\') o += '\\';
    o += c;
  }
  o += '"';
}

// rpy -> rotation matrix (Rz(y) Ry(p) Rx(r)), applied to the inertia tensor
void rpy_matrix(const std::vector<double>& rpy, double R[3][3]) {
  double cr = std::cos(rpy[0]), sr = std::sin(rpy[0]);
  double cp = std::cos(rpy[1]), sp = std::sin(rpy[1]);
  double cy = std::cos(rpy[2]), sy = std::sin(rpy[2]);
  R[0][0] = cy * cp; R[0][1] = cy * sp * sr - sy * cr; R[0][2] = cy * sp * cr + sy * sr;
  R[1][0] = sy * cp; R[1][1] = sy * sp * sr + cy * cr; R[1][2] = sy * sp * cr - cy * sr;
  R[2][0] = -sp;     R[2][1] = cp * sr;                R[2][2] = cp * cr;
}

}  // namespace

extern "C" int cmpc_parse_urdf(const char* path, char* out_buf, long cap) {
  std::ifstream f(path);
  if (!f) return -1;
  std::stringstream ss;
  ss << f.rdbuf();
  std::string xml = ss.str();

  Node robot;
  size_t i = 0;
  if (!parse_element(xml, i, robot) || robot.tag != "robot") return -3;

  std::string o;
  o.reserve(1 << 16);
  o += "{\"name\":";
  emit_str(o, attr(&robot, "name", "robot"));
  o += ",\"links\":[";
  bool first = true;
  for (const auto& link : robot.children) {
    if (link.tag != "link") continue;
    if (!first) o += ',';
    first = false;
    double mass = 0.0;
    std::vector<double> com(3, 0.0);
    double I[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
    if (const Node* inert = find_child(link, "inertial")) {
      mass = nums(attr(find_child(*inert, "mass") ? find_child(*inert, "mass")
                       : nullptr, "value", "0"), 1)[0];
      const Node* origin = find_child(*inert, "origin");
      com = nums(attr(origin, "xyz", "0 0 0"), 3);
      std::vector<double> rpy = nums(attr(origin, "rpy", "0 0 0"), 3);
      const Node* ie = find_child(*inert, "inertia");
      double ixx = nums(attr(ie, "ixx", "0"), 1)[0];
      double ixy = nums(attr(ie, "ixy", "0"), 1)[0];
      double ixz = nums(attr(ie, "ixz", "0"), 1)[0];
      double iyy = nums(attr(ie, "iyy", "0"), 1)[0];
      double iyz = nums(attr(ie, "iyz", "0"), 1)[0];
      double izz = nums(attr(ie, "izz", "0"), 1)[0];
      double L[3][3] = {{ixx, ixy, ixz}, {ixy, iyy, iyz}, {ixz, iyz, izz}};
      double R[3][3];
      rpy_matrix(rpy, R);
      // I = R L R^T (inertia about com, link-frame axes)
      double T[3][3];
      for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 3; ++c)
          T[r][c] = R[r][0] * L[0][c] + R[r][1] * L[1][c] + R[r][2] * L[2][c];
      for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 3; ++c)
          I[r][c] = T[r][0] * R[c][0] + T[r][1] * R[c][1] + T[r][2] * R[c][2];
    }
    o += "{\"name\":";
    emit_str(o, attr(&link, "name", ""));
    o += ",\"mass\":";
    emit_num(o, mass);
    o += ",\"com\":";
    emit_vec(o, com);
    o += ",\"inertia\":[";
    for (int r = 0; r < 3; ++r) {
      if (r) o += ',';
      emit_vec(o, {I[r][0], I[r][1], I[r][2]});
    }
    o += "]}";
  }
  o += "],\"joints\":[";
  first = true;
  for (const auto& joint : robot.children) {
    if (joint.tag != "joint") continue;
    if (!first) o += ',';
    first = false;
    const Node* origin = find_child(joint, "origin");
    const Node* axis = find_child(joint, "axis");
    const Node* lim = find_child(joint, "limit");
    o += "{\"name\":";
    emit_str(o, attr(&joint, "name", ""));
    o += ",\"type\":";
    emit_str(o, attr(&joint, "type", "fixed"));
    o += ",\"parent\":";
    emit_str(o, attr(find_child(joint, "parent"), "link", ""));
    o += ",\"child\":";
    emit_str(o, attr(find_child(joint, "child"), "link", ""));
    o += ",\"xyz\":";
    emit_vec(o, nums(attr(origin, "xyz", "0 0 0"), 3));
    o += ",\"rpy\":";
    emit_vec(o, nums(attr(origin, "rpy", "0 0 0"), 3));
    o += ",\"axis\":";
    emit_vec(o, nums(attr(axis, "xyz", "0 0 1"), 3));
    o += ",\"limit\":[";
    if (lim) {
      emit_num(o, nums(attr(lim, "lower", "-1e999"), 1)[0]); o += ',';
      emit_num(o, nums(attr(lim, "upper", "1e999"), 1)[0]); o += ',';
      emit_num(o, nums(attr(lim, "effort", "1e999"), 1)[0]); o += ',';
      emit_num(o, nums(attr(lim, "velocity", "1e999"), 1)[0]);
    } else {
      o += "-1e999,1e999,1e999,1e999";
    }
    o += "]}";
  }
  o += "]}";

  if (static_cast<long>(o.size()) + 1 > cap) return -2;
  std::memcpy(out_buf, o.data(), o.size());
  out_buf[o.size()] = '\0';
  return static_cast<int>(o.size());
}
