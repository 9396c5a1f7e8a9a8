// Criteo raw-TSV -> slot-format preprocess filter (stdin -> stdout).
//
// Parity target: reference tools/dataset/parser.cpp:36-78 — min-max
// normalize the 13 dense columns, string-hash the 26 categorical columns
// modulo hash_dim.  The output here is this framework's slot text
// (`click:L dense_feature:v ... 1:id ... 26:id`) so the binary slots in
// as a pipe_command-style preprocess for SlotDataset / fast_reader.
//
// Build: g++ -O2 -std=c++17 -o criteo_parser criteo_parser.cpp
// Usage: criteo_parser [hash_dim] < raw.tsv > slots.txt

#include <cstdio>
#include <cstdlib>
#include <functional>
#include <iostream>
#include <string>
#include <vector>

using namespace std;

static const double cont_min[13] = {0, -3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0};
static const double cont_diff[13] = {20,  603, 100, 50, 64000, 500, 100,
                                     50,  500, 10,  10,  10,    50};

int main(int argc, char** argv) {
  long hash_dim = argc > 1 ? atol(argv[1]) : 1000001;
  string line;
  string out;
  out.reserve(1 << 12);
  char buf[64];
  while (getline(cin, line)) {
    // split by tab
    vector<string> cols;
    size_t start = 0;
    while (true) {
      size_t pos = line.find('\t', start);
      if (pos == string::npos) {
        cols.push_back(line.substr(start));
        break;
      }
      cols.push_back(line.substr(start, pos - start));
      start = pos + 1;
    }
    if (cols.size() != 40) continue;
    out.clear();
    out += "click:";
    out += cols[0].empty() ? "0" : cols[0];
    for (int i = 1; i <= 13; ++i) {
      double v = 0.0;
      if (!cols[i].empty())
        v = (strtod(cols[i].c_str(), nullptr) - cont_min[i - 1]) /
            cont_diff[i - 1];
      snprintf(buf, sizeof(buf), " dense_feature:%.6f", v);
      out += buf;
    }
    for (int i = 14; i <= 39; ++i) {
      unsigned long h = std::hash<string>{}(cols[i]) % (unsigned long)hash_dim;
      snprintf(buf, sizeof(buf), " %d:%lu", i - 13, h);
      out += buf;
    }
    out += '\n';
    fwrite(out.data(), 1, out.size(), stdout);
  }
  return 0;
}
