// minimal stand-in for the zstr::ifstream used by the reference refs.cpp;
// supports only uncompressed files (sufficient for golden generation).
#pragma once
#include <fstream>
namespace zstr { using ifstream = std::ifstream; }
