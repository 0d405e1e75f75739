function [x] = scaleFactor()
x = [1.1902511037273813];
end
